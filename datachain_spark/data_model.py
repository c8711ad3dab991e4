"""DataModel / ModelStore / Sys — the reference's typed-signal model layer
(reference src/datachain/lib/data_model.py:1-131, lib/model_store.py:1-137,
lib/dc/utils.py:132-136), re-expressed WITHOUT Pydantic: this engine's
models are plain dataclasses (udf.py:58-61 is_model), so `DataModel` is a
base class whose subclasses are auto-converted to dataclasses and
auto-registered in `ModelStore` — same declaration ergonomics
(`class MyModel(DataModel): x: int`), same registry semantics
(`ModelStore.get("MyModel@v2")`), zero new dependencies.

The registry exists for the same reason as the reference's: rebuilding
typed objects from stored rows needs a name->class lookup that survives
process boundaries (reference signal_schema deserialization,
lib/signal_schema.py:326-380). Here the consumer is `read_dataset(...,
object_name=)` / UDF model-hint coercion (udf.model_from_cell).
"""

from __future__ import annotations

import dataclasses
from datetime import datetime
from typing import (  # noqa: UP035 - typing.List/Dict accepted in user hints
    Any,
    ClassVar,
    Sequence,
    Union,
    get_args,
    get_origin,
)

from datachain_spark.udf import is_model

StandardType = Union[
    type[int],
    type[str],
    type[float],
    type[bool],
    type[list],
    type[dict],
    type[bytes],
    type[datetime],
]
DataType = Union[type, StandardType]  # model class or standard scalar
DataTypeNames = "DataModel/dataclass/NamedTuple, int, str, float, bool, list, dict, bytes, datetime"

_STANDARD = (int, str, float, bool, list, dict, bytes, datetime)


class ModelStore:
    """Name[@vN] -> model-class registry (reference lib/model_store.py:7-137).
    Versions coexist: `get(name)` returns the highest registered version,
    `get(name, v)` / `get("Name@vN")` an exact one. Registration recurses
    into model-typed fields, like the reference's register()."""

    store: ClassVar[dict[str, dict[int, type]]] = {}

    @staticmethod
    def _base_name(model: type) -> str:
        return getattr(model, "_modelstore_base_name", model.__name__)

    @classmethod
    def get_version(cls, model: type) -> int:
        return getattr(model, "_version", 0)

    @classmethod
    def get_name(cls, model: type) -> str:
        base = cls._base_name(model)
        v = cls.get_version(model)
        return f"{base}@v{v}" if v > 0 else base

    @classmethod
    def register(cls, fr: type) -> None:
        if not is_model(fr):
            return
        base = cls._base_name(fr)
        version = cls.get_version(fr)
        for name in {base, fr.__name__}:
            cls.store.setdefault(name, {})[version] = fr
        # recurse into nested model fields (reference model_store.py:52-55)
        from datachain_spark.udf import _hints

        if dataclasses.is_dataclass(fr):
            nested = [_hints(fr).get(f.name) for f in dataclasses.fields(fr)]
        else:
            nested = list(_hints(fr).values())
        for t in nested:
            for cand in (t, *get_args(t)):
                if cand is not fr and is_model(cand):
                    cls.register(cand)

    @classmethod
    def get(cls, name: str, version: int | None = None) -> type | None:
        if version is None and "@" in name:
            name, version = cls.parse_name_version(name)
        versions = cls.store.get(name)
        if not versions:
            return None
        if version is None:
            return versions[max(versions)]
        return versions.get(version)

    @classmethod
    def parse_name_version(cls, fullname: str) -> tuple[str, int]:
        """`"Foo@v2"` -> ("Foo", 2); bare name -> version 0 (reference
        model_store.py:70-79)."""
        name, version = fullname, 0
        if "@" in fullname:
            name, vs = fullname.split("@")
            if vs.strip():
                version = int(vs[1:])
        return name, version

    @classmethod
    def remove(cls, fr: type) -> None:
        for name in {cls._base_name(fr), fr.__name__}:
            versions = cls.store.get(name)
            if versions:
                versions.pop(cls.get_version(fr), None)
                if not versions:
                    del cls.store[name]

    @staticmethod
    def is_partial(fr: type) -> bool:
        return getattr(fr, "_is_partial", False)


class DataModel:
    """Subclass-and-annotate model base (reference lib/data_model.py:31-49):

        class Point(DataModel):
            x: float
            y: float = 0.0

    Subclasses are auto-converted to dataclasses (init/eq/repr for free —
    the Pydantic replacement) and auto-registered in ModelStore, exactly
    the reference's `__pydantic_init_subclass__` hook."""

    _version: ClassVar[int] = 1
    _hidden_fields: ClassVar[list[str]] = []

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        dataclasses.dataclass(cls)
        ModelStore.register(cls)

    @staticmethod
    def register(models: DataType | Sequence[DataType]) -> None:
        """Manual registration for plain dataclass/NamedTuple models that
        don't subclass DataModel (reference data_model.py:42-49)."""
        if isinstance(models, type) or not isinstance(models, Sequence):
            models = [models]  # type: ignore[list-item]
        for m in models:
            ModelStore.register(m)

    @classmethod
    def hidden_fields(cls) -> list[str]:
        return list(cls._hidden_fields)


def is_chain_type(t: Any) -> bool:
    """True if the type can be a chain signal (reference
    data_model.py:108-123): a model class, a standard scalar, or an
    Optional/list/dict composition of those."""
    if is_model(t):
        return True
    if t in _STANDARD:
        return True
    orig, args = get_origin(t), get_args(t)
    if orig is Union or str(type(t)) == "<class 'types.UnionType'>":
        members = [a for a in args if a is not type(None)]
        return bool(members) and all(is_chain_type(a) for a in members)
    if orig in (list, Sequence) and len(args) == 1:
        return is_chain_type(args[0])
    if orig is dict:
        return len(args) == 2 and args[0] is str and is_chain_type(args[1])
    return False


class Sys(DataModel):
    """The internal row-identity signals (reference lib/dc/utils.py:132-136):
    `id` a stable per-row id, `rand` a deterministic 63-bit hash used by
    sample/shuffle/split. Materialized by Chain.with_sys() as a `sys`
    struct column — both derived JVM-side (xxhash64), no Python eval."""

    id: int
    rand: int
