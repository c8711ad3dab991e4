"""Namespaces and projects: a two-level organization layer over the
dataset catalog, mirroring the reference's
`namespace.project.dataset` addressing (reference
src/datachain/lib/namespaces.py:1-125, lib/projects.py:1-130,
dataset.py:89-101 parse_dataset_name, lib/dc/datasets.py:29-52).

Layout: a qualified dataset `ns.proj.name` lives at
`<catalog_root>/<ns>/<proj>/<name>`; an unqualified `name` stays at
`<catalog_root>/<name>` (the DEFAULT namespace/project — existing flat
catalogs keep working unchanged). Namespace and project directories are
marked by `.namespace.json` / `.project.json` metadata files, so they are
never confused with flat dataset directories (which contain `versions/`).

Everything here is driver-side metadata (a handful of dirs and small JSON
files) — at 100 TB the datasets themselves are the scale problem, never
this registry. On an object store the same records would live in a real
catalog service; the layout is a pure function of names either way.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

DEFAULT_NAMESPACE = "local"
DEFAULT_PROJECT = "local"

_NS_MARKER = ".namespace.json"
_PROJ_MARKER = ".project.json"
_RESERVED = {"versions", "data"}


class InvalidDatasetNameError(ValueError):
    pass


class NamespaceNotFoundError(KeyError):
    pass


class ProjectNotFoundError(KeyError):
    pass


@dataclass(frozen=True)
class Namespace:
    name: str
    descr: str | None
    created_at: float
    uuid: str


@dataclass(frozen=True)
class Project:
    namespace: str
    name: str
    descr: str | None
    created_at: float
    uuid: str


def parse_dataset_name(name: str) -> tuple[str | None, str | None, str]:
    """`ns.proj.name` -> (ns, proj, name); `proj.name` -> (None, proj,
    name); `name` -> (None, None, name). >3 parts is invalid — the same
    contract as the reference's parse_dataset_name (dataset.py:89-101)."""
    if not name:
        raise InvalidDatasetNameError("dataset name must be non-empty")
    parts = name.split(".")
    if len(parts) > 3:
        raise InvalidDatasetNameError(f"invalid dataset name {name!r}")
    short = parts[-1]
    proj = parts[-2] if len(parts) > 1 else None
    ns = parts[-3] if len(parts) > 2 else None
    for label, val in (("namespace", ns), ("project", proj), ("dataset", short)):
        if val is not None:
            _validate_part(label, val)
    return ns, proj, short


def _validate_part(label: str, val: str) -> None:
    if not val or "/" in val or os.sep in val or val.startswith(".") or val in _RESERVED:
        raise InvalidDatasetNameError(f"invalid {label} name {val!r}")


def dataset_root(catalog_root: str, name: str) -> str:
    """Filesystem root of a (possibly qualified) dataset name. A bare
    `proj.name` resolves under the default namespace."""
    ns, proj, short = parse_dataset_name(name)
    if ns is None and proj is None:
        return os.path.join(catalog_root, short)
    ns = ns or DEFAULT_NAMESPACE
    return os.path.join(catalog_root, ns, proj, short)


def ensure_dataset_parent(catalog_root: str, name: str) -> None:
    """Auto-create the namespace/project records a qualified save lands in
    (the reference creates the project on demand — lib/projects.py:22)."""
    ns, proj, _ = parse_dataset_name(name)
    if proj is None:
        return
    create_project(catalog_root, ns or DEFAULT_NAMESPACE, proj, exist_ok=True)


# ---------- namespaces ----------
def create_namespace(
    catalog_root: str, name: str, descr: str | None = None, exist_ok: bool = False
) -> Namespace:
    _validate_part("namespace", name)
    d = os.path.join(catalog_root, name)
    marker = os.path.join(d, _NS_MARKER)
    if os.path.exists(marker):
        if exist_ok:
            return _load_ns(marker)
        raise FileExistsError(f"namespace {name!r} already exists")
    os.makedirs(d, exist_ok=True)
    rec = Namespace(name=name, descr=descr, created_at=time.time(), uuid=uuid.uuid4().hex)
    with open(marker, "w") as f:
        json.dump(rec.__dict__, f)
    return rec


def get_namespace(catalog_root: str, name: str) -> Namespace:
    marker = os.path.join(catalog_root, name, _NS_MARKER)
    if not os.path.exists(marker):
        raise NamespaceNotFoundError(f"namespace {name!r} not found")
    return _load_ns(marker)


def list_namespaces(catalog_root: str) -> list[Namespace]:
    """All namespaces, the implicit default first."""
    out = [Namespace(DEFAULT_NAMESPACE, "default namespace", 0.0, "default")]
    if not os.path.isdir(catalog_root):
        return out
    for d in sorted(os.listdir(catalog_root)):
        marker = os.path.join(catalog_root, d, _NS_MARKER)
        if os.path.exists(marker) and d != DEFAULT_NAMESPACE:
            out.append(_load_ns(marker))
    return out


def delete_namespace(catalog_root: str, name: str) -> None:
    """Remove an EMPTY namespace (mirrors the reference's guarded delete)."""
    ns = get_namespace(catalog_root, name)  # raises if missing
    d = os.path.join(catalog_root, ns.name)
    leftover = [x for x in os.listdir(d) if x != _NS_MARKER]
    if leftover:
        raise ValueError(f"namespace {name!r} is not empty: {leftover[:3]}")
    os.remove(os.path.join(d, _NS_MARKER))
    os.rmdir(d)


# ---------- projects ----------
def create_project(
    catalog_root: str,
    namespace: str,
    name: str,
    descr: str | None = None,
    exist_ok: bool = False,
) -> Project:
    """Create a project; its namespace is created on demand (the
    reference does the same — lib/projects.py:22)."""
    _validate_part("project", name)
    create_namespace(catalog_root, namespace, exist_ok=True)
    d = os.path.join(catalog_root, namespace, name)
    marker = os.path.join(d, _PROJ_MARKER)
    if os.path.exists(marker):
        if exist_ok:
            return _load_proj(marker)
        raise FileExistsError(f"project {namespace}.{name} already exists")
    os.makedirs(d, exist_ok=True)
    rec = Project(
        namespace=namespace,
        name=name,
        descr=descr,
        created_at=time.time(),
        uuid=uuid.uuid4().hex,
    )
    with open(marker, "w") as f:
        json.dump(rec.__dict__, f)
    return rec


def get_project(catalog_root: str, namespace: str, name: str) -> Project:
    marker = os.path.join(catalog_root, namespace, name, _PROJ_MARKER)
    if not os.path.exists(marker):
        raise ProjectNotFoundError(f"project {namespace}.{name} not found")
    return _load_proj(marker)


def list_projects(catalog_root: str, namespace: str | None = None) -> list[Project]:
    spaces = (
        [namespace]
        if namespace is not None
        else [n.name for n in list_namespaces(catalog_root) if n.name != DEFAULT_NAMESPACE]
    )
    out: list[Project] = []
    for ns in spaces:
        nsd = os.path.join(catalog_root, ns)
        if not os.path.isdir(nsd):
            continue
        for d in sorted(os.listdir(nsd)):
            marker = os.path.join(nsd, d, _PROJ_MARKER)
            if os.path.exists(marker):
                out.append(_load_proj(marker))
    return out


def delete_project(catalog_root: str, namespace: str, name: str) -> None:
    proj = get_project(catalog_root, namespace, name)
    d = os.path.join(catalog_root, namespace, proj.name)
    leftover = [x for x in os.listdir(d) if x != _PROJ_MARKER]
    if leftover:
        raise ValueError(f"project {namespace}.{name} is not empty: {leftover[:3]}")
    os.remove(os.path.join(d, _PROJ_MARKER))
    os.rmdir(d)


# ---------- dataset enumeration across the hierarchy ----------
def list_dataset_names(
    catalog_root: str,
    namespace: str | None = None,
    project: str | None = None,
) -> list[str]:
    """Dataset names, fully qualified where they live in a project; flat
    (default-namespace) datasets appear by their bare name. Optional
    namespace/project filters (reference datasets() filtering,
    lib/dc/datasets.py:225-280)."""
    from datachain_spark.lake.table import LakeTable

    out: list[str] = []
    if not os.path.isdir(catalog_root):
        return out
    if namespace in (None, DEFAULT_NAMESPACE) and project is None:
        for d in sorted(os.listdir(catalog_root)):
            if LakeTable.exists(os.path.join(catalog_root, d)):
                out.append(d)
    for proj in list_projects(catalog_root, namespace):
        if project is not None and proj.name != project:
            continue
        pd = os.path.join(catalog_root, proj.namespace, proj.name)
        for d in sorted(os.listdir(pd)):
            if LakeTable.exists(os.path.join(pd, d)):
                out.append(f"{proj.namespace}.{proj.name}.{d}")
    return sorted(out)


def _load_ns(marker: str) -> Namespace:
    with open(marker) as f:
        return Namespace(**json.load(f))


def _load_proj(marker: str) -> Project:
    with open(marker) as f:
        return Project(**json.load(f))
