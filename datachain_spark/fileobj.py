"""Scalar File object family — the reference's `File` data models with
real open/read/save/export/cache/resolve behavior, usable inside UDFs.

The reference's primary UDF idiom is `.map(lambda file: file.read_text())`
over `File` objects reconstructed from warehouse rows
(/root/reference/src/datachain/lib/file.py:200-875 for the base model,
876-1504 for the typed variants and fragment models). Here the same
family is plain dataclasses (this engine's DataModel analog, see
datachain_spark/udf.py) whose STORAGE is the Spark `file` struct emitted
by sources/storage.read_storage — chain.map/gen coerce that struct into
these objects when a UDF parameter is type-hinted with one (the
reference's SignalSchema.row_to_objs, lib/signal_schema.py:591-614).

Deliberate substitutions, on record:
- I/O is the worker-local filesystem (`file://` or plain paths). The
  reference dispatches to fsspec cloud clients per scheme
  (lib/file.py:480-512); in a Spark deployment remote storage is
  mounted/fetched by the prefetch stage (sources/storage.prefetch_files)
  or read JVM-side, so the scalar object only ever touches local paths.
- `ImageFile.read()` returns a numpy (h, w, 3) uint8 array, not a PIL
  image (PIL is not in-container; operators/media.py documents the same
  substitution), and the in-container codecs are BMP/WAV/AVI.
- `location` is carried as a JSON STRING column (the reference stores
  JSON in its warehouse too and parses on model load, file.py:266-287).
"""

from __future__ import annotations

import dataclasses
import hashlib
import io
import json
import os
import posixpath
import tempfile
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import PurePath, PurePosixPath
from typing import Any, ClassVar, Iterator
from urllib.parse import unquote, urlparse
from urllib.request import url2pathname

TIME_ZERO = datetime(1970, 1, 1)

EXPORT_PLACEMENTS = ("fullpath", "filename", "etag", "filepath", "checksum")


class FileError(Exception):
    """reference lib/file.py:99-107."""

    def __init__(self, message: str, source: str = "", path: str = ""):
        super().__init__(f"Error in file {source}/{path}: {message}")
        self.message = message
        self.source = source
        self.path = path


class VFileError(FileError):
    """reference lib/file.py:85-96."""

    def __init__(self, message: str, source: str = "", path: str = "", vtype: str = ""):
        Exception.__init__(
            self,
            f"Error in v-file {source}/{path}"
            + (f" of type {vtype}" if vtype else "")
            + f": {message}",
        )
        self.message = message
        self.source = source
        self.path = path
        self.vtype = vtype


def _cache_root() -> str:
    return os.environ.get(
        "DATACHAIN_SPARK_CACHE",
        os.path.join(tempfile.gettempdir(), "datachain_spark_cache"),
    )


def rebase_path(
    src_path: str, old_base: str, new_base: str, suffix: str = "", extension: str = ""
) -> str:
    """Rebase a file URI from one base directory to another (reference
    lib/utils.py rebase_path: substring match on the scheme-stripped
    normalized path, optional stem suffix / extension swap)."""
    def _strip(p: str) -> str:
        u = urlparse(p)
        return str(PurePosixPath(u.netloc + u.path)) if u.scheme else str(PurePosixPath(p))

    src, old = _strip(src_path), _strip(old_base)
    idx = src.find(old)
    if idx == -1:
        raise ValueError(f"old_base '{old_base}' not found in src_path")
    rel = src[idx + len(old):].lstrip("/")
    p = PurePosixPath(rel)
    name = p.stem + suffix + (f".{extension}" if extension else p.suffix)
    rel_out = name if str(p.parent) == "." else str(p.parent / name)
    nb = urlparse(new_base)
    if nb.scheme:
        return f"{nb.scheme}://{PurePosixPath(nb.netloc + nb.path) / rel_out}"
    return str(PurePosixPath(new_base) / rel_out)


@dataclass
class File:
    """Binary file pointer + scalar I/O methods (reference File,
    lib/file.py:200-875). Field set and defaults match the reference's
    `_datachain_column_types`; `location` holds the virtual-file JSON."""

    source: str = ""
    path: str = ""
    size: int = 0
    version: str = ""
    etag: str = ""
    is_latest: bool = True
    last_modified: datetime = field(default_factory=lambda: TIME_ZERO)
    location: str | None = None

    _HIDDEN_FIELDS: ClassVar[tuple[str, ...]] = (
        "source", "version", "etag", "is_latest", "last_modified", "location",
    )

    def __post_init__(self) -> None:
        self.path = PurePath(self.path).as_posix() if self.path else ""
        if isinstance(self.location, (dict, list)):
            self.location = json.dumps(self.location)
        if self.location == "":
            self.location = None
        self._caching_enabled: bool = False

    # ---------- constructors ----------
    @classmethod
    def at(cls, uri: str | os.PathLike) -> "File":
        """Construct from a full URI/path (reference File.at,
        lib/file.py:392-429): scheme URIs split at the bucket
        (source='s3://bucket', path='a/b.txt'); local paths split at the
        parent dir — this engine's read_storage convention, where
        `source` is the listing root."""
        uri = os.fspath(uri)
        if uri.endswith(("/", os.sep)):
            raise ValueError(f"File.at directory URL/path given (trailing slash), got: {uri}")
        parsed = urlparse(uri)
        if parsed.scheme and parsed.scheme != "file":
            return cls(source=f"{parsed.scheme}://{parsed.netloc}", path=parsed.path.lstrip("/"))
        local = url2pathname(parsed.path) if parsed.scheme == "file" else uri
        local = os.path.abspath(local)
        return cls(source=os.path.dirname(local), path=os.path.basename(local))

    @classmethod
    def upload(cls, data: bytes, path: str | os.PathLike) -> "File":
        """Write bytes and return a resolved File (reference File.upload,
        lib/file.py:344-390)."""
        f = cls.at(path)
        os.makedirs(os.path.dirname(f.get_fs_path()) or ".", exist_ok=True)
        with open(f.get_fs_path(), "wb") as h:
            h.write(data)
        return f.resolve()

    @classmethod
    def _from_cell(cls, data: dict) -> "File":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in names})

    # ---------- typed views (reference file.py:311-342) ----------
    def _as(self, cls: type) -> Any:
        if isinstance(self, cls):
            return self
        out = cls(**{f.name: getattr(self, f.name) for f in dataclasses.fields(File)})
        out._caching_enabled = self._caching_enabled
        return out

    def as_text_file(self) -> "TextFile":
        return self._as(TextFile)

    def as_image_file(self) -> "ImageFile":
        return self._as(ImageFile)

    def as_video_file(self) -> "VideoFile":
        return self._as(VideoFile)

    def as_audio_file(self) -> "AudioFile":
        return self._as(AudioFile)

    # ---------- naming (reference file.py:436-458, 668-712) ----------
    @property
    def name(self) -> str:
        return PurePosixPath(self.path).name

    @property
    def parent(self) -> str:
        return str(PurePosixPath(self.path).parent)

    def get_file_suffix(self) -> str:
        return PurePosixPath(self.path).suffix

    def get_file_ext(self) -> str:
        return PurePosixPath(self.path).suffix.lstrip(".")

    def get_file_stem(self) -> str:
        return PurePosixPath(self.path).stem

    def get_full_name(self) -> str:
        return self.path

    def get_path_normalized(self) -> str:
        if not self.path:
            raise FileError("path must not be empty", self.source, self.path)
        if self.path.endswith("/"):
            raise FileError("path must not be a directory", self.source, self.path)
        normpath = PurePath(os.path.normpath(self.path)).as_posix()
        if normpath == ".":
            raise FileError("path must not be a directory", self.source, self.path)
        if any(part == ".." for part in PurePath(normpath).parts):
            raise FileError("path must not contain '..'", self.source, self.path)
        return normpath

    def get_uri(self) -> str:
        return f"{self.source}/{self.get_path_normalized()}"

    def get_fs_path(self) -> str:
        path = unquote(self.get_uri())
        parsed = urlparse(path)
        if parsed.scheme == "file":
            path = url2pathname(parsed.path)
        return path

    def get_hash(self) -> str:
        fingerprint = f"{self.source}/{self.path}/{self.version}/{self.etag}"
        if self.location:
            fingerprint += f"/{self.location}"
        return hashlib.sha256(fingerprint.encode()).hexdigest()

    def _location_list(self) -> list[dict]:
        loc = json.loads(self.location) if isinstance(self.location, str) else self.location
        return [loc] if isinstance(loc, dict) else list(loc or [])

    # ---------- I/O (reference file.py:460-560) ----------
    def open(self, mode: str = "rb", **open_kwargs):
        """Open and return a context manager yielding a file-like object.
        Virtual files (location set) read a byte slice of their parent
        archive (reference TarVFile.open, file.py:122-161); write modes
        refresh metadata on close (file.py:500-512)."""
        return _FileOpen(self, mode, open_kwargs)

    def read_bytes(self, length: int = -1) -> bytes:
        with self.open() as stream:
            return stream.read(length)

    def read_text(self, **open_kwargs) -> str:
        if self.location:
            raise VFileError(
                "Reading text from virtual file is not supported", self.source, self.path
            )
        with self.open(mode="r", **open_kwargs) as stream:
            return stream.read()

    def read(self, length: int = -1):
        return self.read_bytes(length)

    def save(self, destination: str | os.PathLike) -> None:
        """Write contents to destination (reference file.py:561-569)."""
        destination = os.fspath(destination)
        d = urlparse(destination)
        if d.scheme == "file":
            destination = url2pathname(d.path)
        os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
        with open(destination, "wb") as f:
            f.write(self.read())

    # ---------- export (reference file.py:586-608, 720-742) ----------
    def get_destination_path(self, output: str | os.PathLike, placement: str) -> str:
        if placement == "filename":
            path = unquote(self.name)
        elif placement == "etag":
            path = f"{self.etag}{self.get_file_suffix()}"
        elif placement == "fullpath":
            path = unquote(self.get_path_normalized())
            source = urlparse(self.source)
            if source.scheme and source.scheme != "file":
                path = posixpath.join(source.netloc, path)
        elif placement == "filepath":
            path = unquote(self.get_path_normalized())
        elif placement == "checksum":
            raise NotImplementedError("Checksum placement not implemented yet")
        else:
            raise ValueError(f"Unsupported file export placement: {placement}")
        return posixpath.join(os.fspath(output), path)

    def export(
        self,
        output: str | os.PathLike,
        placement: str = "fullpath",
        use_cache: bool = True,
        link_type: str = "copy",
    ) -> None:
        import errno

        self._caching_enabled = use_cache
        dst = self.get_destination_path(output, placement)
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        if link_type == "symlink":
            try:
                if self.location:
                    raise OSError(errno.ENOTSUP, "Symlinking virtual file is not supported")
                if self._caching_enabled:
                    self.ensure_cached()
                    src = self.get_local_path() or self.get_fs_path()
                else:
                    src = self.get_fs_path()
                os.symlink(src, dst)
                return
            except OSError as exc:
                # same fall-through set as the reference (file.py:600-606)
                if exc.errno not in (errno.ENOTSUP, errno.EXDEV, errno.ENOSYS):
                    raise
        self.save(dst)

    # ---------- local cache (reference file.py:620-666; cache.py) ----------
    def ensure_cached(self) -> None:
        """Copy contents into the local cache keyed by the file's content
        fingerprint (the reference's dvc-data odb keyed by etag,
        file.py:620-643)."""
        dst = self._cache_path()
        if os.path.exists(dst):
            return
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = f"{dst}.{os.getpid()}.tmp"
        # read the SOURCE directly (never through the caching open path —
        # that would recurse back here)
        if self.location:
            raw = VFileRegistry.open(self, self._location_list())
            data = io.BufferedReader(raw).read()
        else:
            with open(self.get_fs_path(), "rb") as src:
                data = src.read()
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, dst)  # atomic; concurrent cachers converge

    def get_local_path(self) -> str | None:
        """Path of the cached copy, or None if not cached (file.py:656-666)."""
        dst = self._cache_path()
        return dst if os.path.exists(dst) else None

    def _cache_path(self) -> str:
        h = self.get_hash()
        return os.path.join(_cache_root(), h[:2], h[2:] + self.get_file_suffix())

    # ---------- resolve / rebase (reference file.py:753-847) ----------
    def resolve(self) -> "File":
        """Stat the filesystem and return a File with fresh metadata; a
        missing/unreadable file resolves to the reference's defaults
        (size 0, empty etag, TIME_ZERO; file.py:786-811). The etag recipe
        md5(path NUL size NUL mtime-seconds) matches what read_storage
        computes JVM-side (sources/storage.py:172-176), so resolve() of a
        listed file reproduces its listed etag."""
        try:
            normalized = self.get_path_normalized()
            st = os.stat(self.get_fs_path())
            etag = hashlib.md5(
                f"{normalized}\x00{st.st_size}\x00{int(st.st_mtime)}".encode(),
                usedforsecurity=False,
            ).hexdigest()
            out = type(self)(
                path=self.path,
                source=self.source,
                size=st.st_size,
                etag=etag,
                version=self.version,
                is_latest=True,
                last_modified=datetime.fromtimestamp(st.st_mtime),
                location=self.location,
            )
        except (FileError, FileNotFoundError, PermissionError, OSError):
            out = type(self)(
                path=self.path, source=self.source, size=0, etag="",
                version="", is_latest=True, last_modified=TIME_ZERO,
                location=self.location,
            )
        out._caching_enabled = self._caching_enabled
        return out

    def rebase(self, old_base: str, new_base: str, suffix: str = "", extension: str = "") -> str:
        return rebase_path(self.get_uri(), old_base, new_base, suffix, extension)


class _FileSlice(io.RawIOBase):
    """Readable window [offset, offset+size) of an underlying stream —
    the reference's FileSlice used by TarVFile (lib/utils.py)."""

    def __init__(self, fileobj, offset: int, size: int, name: str):
        self.fileobj = fileobj
        self.offset = offset
        self.size = size
        self.name = name
        self.position = 0
        fileobj.seek(offset)

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def tell(self) -> int:
        return self.position

    def seek(self, position: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_SET:
            self.position = position
        elif whence == io.SEEK_CUR:
            self.position += position
        elif whence == io.SEEK_END:
            self.position = self.size + position
        self.position = min(max(self.position, 0), self.size)
        self.fileobj.seek(self.offset + self.position)
        return self.position

    def readinto(self, b) -> int:
        n = min(len(b), self.size - self.position)
        if n <= 0:
            return 0
        data = self.fileobj.read(n)
        b[: len(data)] = data
        self.position += len(data)
        return len(data)

    def close(self) -> None:
        try:
            self.fileobj.close()
        finally:
            super().close()


class _FileOpen:
    """Context manager behind File.open — picks the real / vfile / cached
    stream and refreshes metadata after a write (file.py:460-512)."""

    def __init__(self, file: File, mode: str, open_kwargs: dict):
        self.file = file
        self.mode = mode
        self.open_kwargs = open_kwargs
        self.stream = None
        self.writing = any(ch in mode for ch in "wax+")

    def __enter__(self):
        f = self.file
        if f.location and self.writing:
            raise VFileError("Writing to virtual file is not supported", f.source, f.path)
        if f.location:
            raw = VFileRegistry.open(f, f._location_list())
            self.stream = (
                io.TextIOWrapper(io.BufferedReader(raw), **self.open_kwargs)
                if "b" not in self.mode
                else io.BufferedReader(raw)
            )
            return self.stream
        path = f.get_fs_path()
        if not self.writing and f._caching_enabled:
            f.ensure_cached()
            path = f.get_local_path() or path
        if self.writing:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.stream = open(path, self.mode, **self.open_kwargs)
        return self.stream

    def __exit__(self, *exc) -> None:
        if self.stream is not None:
            self.stream.close()
        if self.writing and not any(exc):
            fresh = self.file.resolve()
            for fld in dataclasses.fields(File):
                setattr(self.file, fld.name, getattr(fresh, fld.name))


# ---------------------------------------------------------------------------
# virtual files (reference file.py:110-197)
# ---------------------------------------------------------------------------


class TarVFile:
    """Reads a tar member as a byte slice of the parent archive — never
    re-parses the tar (reference TarVFile, file.py:122-161; the
    DataFrame-side equivalent is sources/tar.read_vfile_bytes)."""

    vtype = "tar"

    @classmethod
    def parent(cls, file: File, location: list[dict]) -> File:
        if len(location) > 1:
            raise VFileError("multiple 'location's are not supported yet", file.source, file.path)
        parent = location[0].get("parent")
        if parent is None:
            raise VFileError("'parent' is not specified", file.source, file.path)
        return File._from_cell(parent)

    @classmethod
    def open(cls, file: File, location: list[dict]):
        tar_file = cls.parent(file, location)
        loc = location[0]
        if (offset := loc.get("offset")) is None:
            raise VFileError("'offset' is not specified", file.source, file.path)
        if (size := loc.get("size")) is None:
            raise VFileError("'size' is not specified", file.source, file.path)
        fd = open(tar_file.get_fs_path(), "rb")
        return _FileSlice(fd, int(offset), int(size), file.name)


class VFileRegistry:
    """vtype -> reader dispatch (reference file.py:164-197)."""

    _vtype_readers: ClassVar[dict[str, type]] = {"tar": TarVFile}

    @classmethod
    def register(cls, reader: type) -> None:
        cls._vtype_readers[reader.vtype] = reader

    @classmethod
    def _get_reader(cls, file: File, location: list[dict]):
        if not location:
            raise VFileError("'location' must not be list of JSONs", file.source, file.path)
        vtype = location[0].get("vtype", "")
        if not vtype:
            raise VFileError("vtype is not specified", file.source, file.path)
        reader = cls._vtype_readers.get(vtype)
        if not reader:
            raise VFileError("reader not registered", file.source, file.path, vtype=vtype)
        return reader

    @classmethod
    def open(cls, file: File, location: list[dict]):
        return cls._get_reader(file, location).open(file, location)

    @classmethod
    def parent(cls, file: File, location: list[dict]) -> File:
        return cls._get_reader(file, location).parent(file, location)


def tar_member_file(parent: File, name: str, size: int, offset: int, etag: str = "") -> File:
    """Build the reference's tar virtual-file row (process_tar's File with
    a location chain, lib/tar.py:13-35): path = parent-path/member-name,
    location = [{vtype, parent, size, offset}]. The DataFrame-scale path
    is sources/tar.process_tar; this is its scalar twin for UDF use."""
    return File(
        source=parent.source,
        path=f"{parent.path}/{name}",
        size=size,
        etag=etag,
        location=[{
            "vtype": TarVFile.vtype,
            "parent": {f.name: getattr(parent, f.name) for f in dataclasses.fields(File)
                       if f.name != "last_modified"},
            "size": size,
            "offset": offset,
        }],
    )


# ---------------------------------------------------------------------------
# typed files (reference file.py:876-1218)
# ---------------------------------------------------------------------------


@dataclass
class TextFile(File):
    """Text-mode default (reference TextFile, file.py:876-910)."""

    def open(self, mode: str = "r", **open_kwargs):
        return super().open(mode=mode, **open_kwargs)

    def read_text(self, **open_kwargs) -> str:
        with self.open(**open_kwargs) as stream:
            return stream.read()

    def save(self, destination: str | os.PathLike) -> None:
        destination = os.fspath(destination)
        os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
        with open(destination, "w") as f:
            f.write(self.read_text())


@dataclass
class Image:
    """reference file.py:964-977."""

    width: int = -1
    height: int = -1
    format: str = ""


@dataclass
class ImageFile(File):
    """reference ImageFile, file.py:912-961 — `read()` returns a numpy
    (h, w, 3) uint8 array (PIL substitution, see module docstring)."""

    def get_info(self) -> Image:
        from datachain_spark.operators.media import image_info

        return Image(**image_info(self.read_bytes()))

    def read(self):
        from datachain_spark.operators.media import bmp_to_np

        return bmp_to_np(super().read())

    def save(self, destination: str | os.PathLike, format: str | None = None) -> None:
        destination = os.fspath(destination)
        fmt = format or PurePosixPath(destination).suffix.lstrip(".").lower()
        if not fmt:
            raise FileError(
                f"Can't determine format for destination '{destination}'",
                self.source, self.path,
            )
        if fmt != "bmp":
            raise NotImplementedError(
                f"image format {fmt!r} needs an external codec; only 'bmp' is "
                "available in-container"
            )
        from datachain_spark.operators.media import np_to_bmp

        os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
        with open(destination, "wb") as f:
            f.write(np_to_bmp(self.read()))


@dataclass
class Video:
    """reference file.py:1391-1415."""

    width: int = -1
    height: int = -1
    fps: float = -1.0
    duration: float = -1.0
    frames: int = -1
    format: str = ""
    codec: str = ""


@dataclass
class Audio:
    """reference file.py:1418-1461."""

    sample_rate: int = -1
    channels: int = -1
    duration: float = -1.0
    samples: int = -1
    format: str = ""
    codec: str = ""
    bit_rate: int = -1

    @staticmethod
    def get_channel_name(num_channels: int, channel_idx: int) -> str:
        mappings = {
            1: ["Mono"],
            2: ["Left", "Right"],
            4: ["W", "X", "Y", "Z"],
            6: ["FL", "FR", "FC", "LFE", "BL", "BR"],
            8: ["FL", "FR", "FC", "LFE", "BL", "BR", "SL", "SR"],
        }
        names = mappings.get(num_channels)
        if names and 0 <= channel_idx < len(names):
            return names[channel_idx]
        return f"Ch{channel_idx + 1}"


@dataclass
class VideoFile(File):
    """reference VideoFile, file.py:980-1102."""

    def get_info(self) -> Video:
        from datachain_spark.operators.media import video_info

        return Video(**video_info(self.read_bytes()))

    def get_frame(self, frame: int) -> "VideoFrame":
        if frame < 0:
            raise ValueError("frame must be a non-negative integer")
        return VideoFrame(video=self, frame=frame)

    def get_frames(self, start: int = 0, end: int | None = None, step: int = 1) -> Iterator["VideoFrame"]:
        from datachain_spark.operators.media import validate_frame_range

        start, end, step = validate_frame_range(self.read_bytes(), start, end, step)
        for frame in range(start, end, step):
            yield self.get_frame(frame)

    def get_fragment(self, start: float, end: float) -> "VideoFragment":
        if start < 0 or end < 0 or start >= end:
            raise ValueError(
                f"Can't get video fragment for '{self.path}', "
                f"invalid time range: ({start:.3f}, {end:.3f})"
            )
        return VideoFragment(video=self, start=start, end=end)

    def get_fragments(
        self, duration: float, start: float = 0, end: float | None = None
    ) -> Iterator["VideoFragment"]:
        if duration <= 0:
            raise ValueError("duration must be a positive float")
        if start < 0:
            raise ValueError("start must be a non-negative float")
        if end is None:
            end = self.get_info().duration
        if end < 0:
            raise ValueError("end must be a non-negative float")
        if start >= end:
            raise ValueError("start must be less than end")
        while start < end:
            yield self.get_fragment(start, min(start + duration, end))
            start += duration


@dataclass
class AudioFile(File):
    """reference AudioFile, file.py:1105-1218."""

    def get_info(self) -> Audio:
        from datachain_spark.operators.media import audio_info

        return Audio(**audio_info(self.read_bytes()))

    def get_fragment(self, start: float, end: float) -> "AudioFragment":
        if start < 0 or end < 0 or start >= end:
            raise ValueError(
                f"Can't get audio fragment for '{self.path}', "
                f"invalid time range: ({start:.3f}, {end:.3f})"
            )
        return AudioFragment(audio=self, start=start, end=end)

    def get_fragments(
        self, duration: float, start: float = 0, end: float | None = None
    ) -> Iterator["AudioFragment"]:
        if duration <= 0:
            raise ValueError("duration must be a positive float")
        if start < 0:
            raise ValueError("start must be a non-negative float")
        if end is None:
            end = self.get_info().duration
        if end < 0:
            raise ValueError("end must be a non-negative float")
        if start >= end:
            raise ValueError("start must be less than end")
        while start < end:
            yield self.get_fragment(start, min(start + duration, end))
            start += duration

    def save(
        self,
        output: str,
        format: str | None = None,
        start: float = 0,
        end: float | None = None,
    ) -> "AudioFile":
        from datachain_spark.operators.media import save_audio

        res = save_audio(self.read_bytes(), self.get_file_stem(), output, format, start, end)
        return AudioFile.at(res["path"]).resolve()


@dataclass
class AudioFragment:
    """reference file.py:1220-1285."""

    audio: AudioFile
    start: float
    end: float

    def get_np(self):
        from datachain_spark.operators.media import audio_to_np

        return audio_to_np(self.audio.read_bytes(), self.start, self.end - self.start)

    def read_bytes(self, format: str = "wav") -> bytes:
        from datachain_spark.operators.media import audio_to_bytes

        return audio_to_bytes(
            self.audio.read_bytes(), format, self.start, self.end - self.start
        )

    def save(self, output: str, format: str | None = None) -> AudioFile:
        from datachain_spark.operators.media import save_audio

        res = save_audio(
            self.audio.read_bytes(), self.audio.get_file_stem(), output, format,
            self.start, self.end,
        )
        return AudioFile.at(res["path"]).resolve()


@dataclass
class VideoFrame:
    """reference file.py:1288-1348."""

    video: VideoFile
    frame: int

    def get_np(self):
        from datachain_spark.operators.media import video_frame_np

        return video_frame_np(self.video.read_bytes(), self.frame)

    def read_bytes(self, format: str = "bmp") -> bytes:
        from datachain_spark.operators.media import video_frame_bytes

        return video_frame_bytes(self.video.read_bytes(), self.frame, format)

    def save(self, output: str, format: str = "bmp") -> ImageFile:
        from datachain_spark.operators.media import save_video_frame

        res = save_video_frame(
            self.video.read_bytes(), self.video.get_file_stem(), self.frame, output, format
        )
        return ImageFile.at(res["path"]).resolve()


@dataclass
class VideoFragment:
    """reference file.py:1351-1388."""

    video: VideoFile
    start: float
    end: float

    def save(self, output: str, format: str | None = None) -> VideoFile:
        from datachain_spark.operators.media import save_video_fragment

        res = save_video_fragment(
            self.video.read_bytes(), self.video.get_file_stem(), self.start, self.end,
            output, format,
        )
        return VideoFile.at(res["path"]).resolve()


@dataclass
class ArrowRow:
    """One row of an Arrow-readable file by index (reference file.py:1464-1490)."""

    file: File
    index: int

    def read(self) -> dict:
        from pyarrow.dataset import dataset

        path = self.file.get_fs_path()
        if self.file._caching_enabled:
            self.file.ensure_cached()
            path = self.file.get_local_path() or path
        return dataset(path).take([self.index]).to_pylist()[0]


def get_file_type(type_: str = "binary") -> type[File]:
    """reference file.py:1493-1504."""
    return {
        "binary": File,
        "text": TextFile,
        "image": ImageFile,
        "video": VideoFile,
        "audio": AudioFile,
    }.get(type_, File)
