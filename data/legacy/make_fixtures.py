"""Regenerate the committed legacy-schema checkpoint fixtures.

Analog of the reference's schema-compatibility fixtures
(``/root/reference/data/schemas/`` + ``tests/utils/schemas.h``): these
directories hold checkpoints written in OLD schema versions so that
``utils/upgrader.py`` migrations stay guarded by tests
(``tests/test_aux.py::TestUpgrader``).

The fixture data is deterministic (seeded) so tests can recreate the source
array and compare reconstructions after an upgrade.

Usage:  python data/legacy/make_fixtures.py
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

from scalablevectorsearch_tpu.quantization.lvq import (  # noqa: E402
    _quantize_primary, _quantize_residual)

N, DIM, SEED = 48, 20, 7


def fixture_data() -> np.ndarray:
    return np.random.default_rng(SEED).normal(
        size=(N, DIM)).astype(np.float32)


def write_lvq_v001(directory: str, bits: int, residual_bits: int) -> None:
    """Write an LVQ checkpoint in the v0.0.1 layout: unpadded, UNPACKED
    ``(n, dim)`` int8 code blobs (v0.0.2 pads to the lane width and packs
    4-bit codes two per byte)."""
    os.makedirs(directory, exist_ok=True)
    x = fixture_data()
    mean = x.mean(axis=0)
    codes, scales, biases = _quantize_primary(x - mean, bits)
    recon1 = mean + biases[:, None] + scales[:, None] * codes.astype(
        np.float32)

    def blob(name, arr):
        np.save(os.path.join(directory, name), arr)
        return name + ".npy"

    table = {
        "__schema__": "lvq_dataset",
        "__version__": "v0.0.1",
        "name": "lvq dataset",
        "codes": blob("codes", codes),
        "scales": blob("scales", scales),
        "biases": blob("biases", biases),
        "mean": blob("mean", mean),
        "dims": DIM,
        "num_vectors": N,
        "bits": bits,
        "residual_bits": residual_bits,
    }
    if residual_bits:
        res_c, res_s = _quantize_residual(x - recon1, residual_bits)
        table["res_codes"] = blob("res_codes", res_c)
        table["res_scales"] = blob("res_scales", res_s)
    with open(os.path.join(directory, "svs_config.json"), "w") as f:
        json.dump(table, f, indent=2)


def write_vamana_params_v001(directory: str) -> None:
    """vamana_index_parameters before the optional entry_sampler field."""
    os.makedirs(directory, exist_ok=True)
    table = {
        "__schema__": "vamana_index_parameters",
        "__version__": "v0.0.1",
        "name": "vamana index parameters",
        "entry_point": 3,
        "distance": "l2",
        "build_parameters": {
            "__schema__": "vamana_build_parameters",
            "__version__": "v0.0.1",
            "alpha": 1.2, "graph_max_degree": 16, "window_size": 32,
            "max_candidate_pool_size": 80, "prune_to": 14,
            "use_full_search_history": True,
        },
        "search_parameters": {
            "__schema__": "vamana_search_parameters",
            "__version__": "v0.0.1",
            "search_window_size": 16, "search_buffer_capacity": 16,
            "search_buffer_visited_set": False,
            "prefetch_lookahead": 4, "prefetch_step": 1,
        },
    }
    with open(os.path.join(directory, "svs_config.json"), "w") as f:
        json.dump(table, f, indent=2)


if __name__ == "__main__":
    write_lvq_v001(os.path.join(HERE, "lvq4x8_v001"), bits=4,
                   residual_bits=8)
    write_lvq_v001(os.path.join(HERE, "lvq8_v001"), bits=8, residual_bits=0)
    write_vamana_params_v001(os.path.join(HERE, "vamana_params_v001"))
    print("fixtures written under", HERE)
