"""Schema-dispatched dataset loading.

Analog of the reference's ``dispatch_load`` (``include/svs/core/loading.h:74``)
and the Dispatcher-driven loader selection in the Python bindings: a saved
dataset directory is identified by the ``__schema__`` key in its config table
and routed to the registered dataset class.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from ..lib import saveload

_DATASET_REGISTRY: Dict[str, Any] = {}


def register_dataset(cls) -> Any:
    """Register a dataset class by its SCHEMA for load dispatch."""
    _DATASET_REGISTRY[cls.SCHEMA] = cls
    return cls


def dispatch_load(directory: str, **kwargs):
    """Load whatever dataset type lives in ``directory``."""
    table = saveload.read_table(directory)
    schema = table.get(saveload.SCHEMA_KEY)
    cls = _DATASET_REGISTRY.get(schema)
    if cls is None:
        raise ValueError(
            f"no dataset registered for schema {schema!r} "
            f"(known: {sorted(_DATASET_REGISTRY)})")
    ctx = saveload.LoadContext(directory)
    return cls.load(table, ctx, **kwargs)


def _register_builtin():
    from .data import VectorDataset
    register_dataset(VectorDataset)
    try:
        from ..quantization.scalar import SQDataset
        register_dataset(SQDataset)
    except ImportError:  # pragma: no cover
        pass
    try:
        from ..quantization.lvq import LVQDataset
        register_dataset(LVQDataset)
    except ImportError:  # pragma: no cover
        pass


_register_builtin()
