"""Clustering container: centroids + per-point assignments.

Analog of the reference's ``Clustering`` (``include/svs/index/ivf/
clustering.h:85``), the saveable intermediate between k-means training and
index assembly (mirrors the Python surface ``svs.Clustering.build`` +
``IVF.assemble_from_clustering``, bindings ivf.cpp:207-380).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ...lib import saveload
from .kmeans import train_clustering
from .params import IVFBuildParameters


@dataclasses.dataclass
class Clustering:
    centroids: np.ndarray     # (K, d) float32
    assignments: np.ndarray   # (n,) int32

    SCHEMA = "ivf_clustering"
    VERSION = saveload.Version(0, 0, 1)

    @classmethod
    def build(cls, parameters: IVFBuildParameters, data) -> "Clustering":
        """Train k-means over the data (reference build_clustering)."""
        x = data.to_numpy() if hasattr(data, "to_numpy") else np.asarray(data)
        centroids, assignments = train_clustering(x, parameters)
        return cls(centroids=centroids, assignments=assignments)

    @property
    def num_centroids(self) -> int:
        return self.centroids.shape[0]

    def cluster_sizes(self) -> np.ndarray:
        return np.bincount(self.assignments, minlength=self.num_centroids)

    def save(self, ctx: saveload.SaveContext) -> dict:
        return saveload.save_table(self.SCHEMA, self.VERSION, {
            "name": "ivf clustering",
            "centroids": ctx.save_array(self.centroids),
            "assignments": ctx.save_array(self.assignments),
            "num_centroids": self.num_centroids,
        })

    @classmethod
    def load(cls, table: dict, ctx: saveload.LoadContext) -> "Clustering":
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        return cls(centroids=ctx.load_array(table["centroids"]),
                   assignments=ctx.load_array(table["assignments"]))
