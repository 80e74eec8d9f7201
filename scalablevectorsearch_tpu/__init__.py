"""scalablevectorsearch_tpu: a TPU-native vector similarity search framework.

A from-scratch JAX/XLA/Pallas re-imagining of the capabilities of
intel/ScalableVectorSearch (SVS): Vamana graph indexes, brute-force flat
search, IVF, two-level inverted indexes, scalar/LVQ-style quantization,
dynamic (mutable) indexes, schema-versioned checkpoints, calibration, and a
benchmark harness — built around batched lockstep beam search, MXU distance
matmuls, and `shard_map` scale-out over TPU meshes instead of threadpools,
NUMA, and AVX-512.
"""

__version__ = "0.1.0"

import os as _os

# Persistent compilation cache: the compute kernels (beam search, build
# rounds, prune) are large HLO programs whose compiles take tens of seconds;
# caching them across processes makes builds/benchmarks start hot.
# Opt IN with SVT_COMPILE_CACHE_DIR (hangs on the experimental axon TPU
# plugin, so it is not enabled by default).
if _os.environ.get("SVT_COMPILE_CACHE_DIR"):
    import jax as _jax

    try:
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["SVT_COMPILE_CACHE_DIR"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass

from .core.data import VectorDataset
from .core.graph import NeighborGraph
from .core.io import read_vecs, write_vecs, read_npy, write_npy, \
    generate_test_dataset
from .core.query_result import QueryResult
from .core.recall import k_recall_at_n
from .ops.distance import DistanceType, as_distance
from .index.flat import FlatIndex, exhaustive_search

# Convenience aliases matching the reference's Python surface (svs.*)
L2 = DistanceType.L2
MIP = DistanceType.MIP
Cosine = DistanceType.Cosine

__all__ = [
    "VectorDataset", "NeighborGraph", "QueryResult",
    "read_vecs", "write_vecs", "read_npy", "write_npy",
    "generate_test_dataset", "k_recall_at_n",
    "DistanceType", "as_distance", "L2", "MIP", "Cosine",
    "FlatIndex", "exhaustive_search",
]



try:  # Vamana family (index + orchestrator API)
    from .index.vamana.index import VamanaIndex  # noqa: F401
    from .index.vamana.params import (  # noqa: F401
        VamanaBuildParameters, VamanaSearchParameters, SearchBufferConfig)
    from .orchestrators.vamana import Vamana  # noqa: F401
    __all__ += ["VamanaIndex", "VamanaBuildParameters",
                "VamanaSearchParameters", "SearchBufferConfig", "Vamana"]
except ImportError:  # pragma: no cover - during incremental bring-up
    pass

try:  # Flat orchestrator
    from .orchestrators.flat import Flat  # noqa: F401
    __all__ += ["Flat"]
except ImportError:  # pragma: no cover
    pass

try:  # Dynamic Vamana + Dynamic Flat
    from .index.vamana.dynamic import MutableVamanaIndex  # noqa: F401
    from .index.vamana.multi import MultiMutableVamanaIndex  # noqa: F401
    from .index.vamana.iterator import (  # noqa: F401
        BatchIterator, DefaultSchedule, LinearSchedule)
    from .index.vamana.calibrate import (  # noqa: F401
        CalibrationParameters, calibrate)
    from .orchestrators.dynamic_vamana import (  # noqa: F401
        DynamicFlat, DynamicVamana)
    __all__ += ["MutableVamanaIndex", "MultiMutableVamanaIndex",
                "BatchIterator", "DefaultSchedule", "LinearSchedule",
                "CalibrationParameters", "calibrate", "DynamicVamana",
                "DynamicFlat"]
except ImportError:  # pragma: no cover
    pass

try:  # IVF
    from .index.ivf.params import IVFBuildParameters, IVFSearchParameters  # noqa: F401
    from .index.ivf.dynamic import DynamicIVF  # noqa: F401
    from .index.ivf.iterator import IVFBatchIterator  # noqa: F401
    from .orchestrators.ivf import IVF, Clustering  # noqa: F401
    __all__ += ["IVFBuildParameters", "IVFSearchParameters", "IVF",
                "Clustering", "DynamicIVF", "IVFBatchIterator"]
except ImportError:  # pragma: no cover
    pass

try:  # Inverted
    from .index.inverted.index import (  # noqa: F401
        InvertedBuildParameters, InvertedSearchParameters)
    from .orchestrators.inverted import Inverted  # noqa: F401
    __all__ += ["Inverted", "InvertedBuildParameters",
                "InvertedSearchParameters"]
except ImportError:  # pragma: no cover
    pass

try:  # Quantization
    from .quantization.scalar import SQDataset  # noqa: F401
    from .quantization.lvq import LVQDataset  # noqa: F401
    __all__ += ["SQDataset", "LVQDataset"]
except ImportError:  # pragma: no cover
    pass
