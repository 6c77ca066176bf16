"""Per-dataset configuration (reference: model/dataset.py:20-39).

``shards`` is immutable after first write (docs/architecture.md:119-129);
default 0 means a single shard ``"0"`` so small datasets don't fragment
into tiny files. ``compression`` selects the parquet codec for exports.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class DatasetConfig:
    name: str
    title: str | None = None
    shards: int = 0
    compression: str | None = "zstd"
    public_url_prefix: str | None = None
    """Public URL prefix for published artifacts and archive blobs,
    templated with ``{dataset}`` (reference DatasetModel
    ``public_url_prefix`` + jinja render, model/dataset.py:34-38 /
    util.py:155-164; str.format here — no template engine needed for
    one variable)."""
    metadata: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        validate_dataset_name(self.name)
        if self.shards < 0:
            raise ValueError("shards must be >= 0")

    # -- persistence (a tiny JSON sidecar next to the table; ``fs`` is
    # a sources.fs shim so the sidecar follows the store onto Hadoop
    # URIs — S16) ---------------------------------------------------------
    @classmethod
    def load(cls, path: str, fs=None) -> "DatasetConfig":
        # reads through the base class construct the REGISTERED model
        # (set_model_class), so downstream config extensions survive
        # every load path; an explicit subclass call keeps its class
        model = get_model_class() if cls is DatasetConfig else cls
        if fs is not None:
            return model(**json.loads(fs.read_text(path)))
        with open(path) as fh:
            return model(**json.load(fh))

    def dump(self, path: str, fs=None) -> None:
        if fs is not None:
            fs.write_text_atomic(path, json.dumps(asdict(self)))
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(asdict(self), fh)
        os.replace(tmp, path)


#: the process-wide dataset-config model (reference set_model_class,
#: model/dataset.py:44-72): downstream tools that extend config.yml
#: register a subclass once at process start and every config read —
#: Lakehouse.dataset, sidecar load, configure updates — constructs it.
_model_class: type = DatasetConfig


def set_model_class(model_class: type) -> None:
    """Register a custom :class:`DatasetConfig` subclass process-wide
    (reference ``set_model_class``). Call before any dataset access —
    ``Dataset`` objects snapshot their config at construction.

    ```python
    @dataclass
    class MyConfig(DatasetConfig):
        my_field: str | None = None

    set_model_class(MyConfig)
    ```
    """
    if not (isinstance(model_class, type) and issubclass(model_class, DatasetConfig)):
        raise TypeError(
            f"{model_class!r} is not a DatasetConfig subclass"
        )
    global _model_class
    _model_class = model_class


def get_model_class() -> type:
    """The registered config model (reference ``get_model_class``)."""
    return _model_class


def validate_dataset_name(name: str) -> str:
    """Boundary validation (reference: util.py:38-107) — dataset names are
    path components and must never enable traversal or injection."""
    import re

    if not re.fullmatch(r"[a-z0-9][a-z0-9_-]{0,127}", name):
        raise ValueError(f"invalid dataset name: {name!r}")
    return name


def validate_origin(origin: str) -> str:
    """Origins are partition directory names. Mirror the reference's
    ``safe_name`` semantics (util.py:38-107): reject empty, path
    separators, ``.``/``..`` traversal, control chars, and over-long
    values — but ALLOW other printable characters, because the
    reference documents origins like ``mapping:abc123``. Characters
    Hive-escapes (':', '=', '%', '#', non-ASCII) are percent-encoded by
    Spark in the partition dir name and decoded symmetrically on read —
    both by Spark scans and by the serving path's ``unquote``
    (serving.py ``_index_snapshot``)."""
    import re

    if not isinstance(origin, str) or not origin:
        raise ValueError(f"invalid origin (empty or non-string): {origin!r}")
    if len(origin) > 255:
        raise ValueError(f"origin too long ({len(origin)} > 255): {origin[:40]!r}…")
    if origin in (".", "..") or ".." in origin:
        raise ValueError(f"origin contains path traversal: {origin!r}")
    if re.search(r"[\x00-\x1f\x7f/\\]", origin):
        raise ValueError(
            f"origin contains forbidden characters "
            f"(path separator or control char): {origin!r}"
        )
    return origin
