"""Benchmark framework tests + golden-recall integration test (the analog of
the reference's golden-TOML integration strategy, SURVEY §4.2)."""

import json
import os

import numpy as np
import pytest

from scalablevectorsearch_tpu.benchmark import (BenchmarkDispatcher, run_job,
                                                run_jobs)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "golden")
GOLDEN_PATH = os.path.join(GOLDEN_DIR, "vamana_reference.json")

TINY = {"synthetic": {"n": 1500, "n_queries": 64, "dim": 24, "seed": 9}}


class TestDispatcher:
    def test_registry(self):
        names = BenchmarkDispatcher.names()
        assert "vamana_search" in names
        assert "vamana_static_build" in names
        assert "ivf_search" in names
        assert "vamana_test_generator" in names
        with pytest.raises(KeyError):
            BenchmarkDispatcher.lookup("nope")


class TestWorkloads:
    def test_vamana_build_job(self):
        job = dict(executable="vamana_static_build", **TINY,
                   build_parameters={"graph_max_degree": 16,
                                     "window_size": 32},
                   search_window_size=20)
        res = run_job(job)
        assert res["num_points"] == 1500
        assert res["build_time_s"] > 0
        assert res["recall"] > 0.5
        assert "wall_time_s" in res

    def test_vamana_search_sweep(self):
        job = dict(executable="vamana_search", **TINY,
                   build_parameters={"graph_max_degree": 16,
                                     "window_size": 32},
                   search_window_sizes=[10, 30],
                   target_recalls=[0.9])
        res = run_job(job)
        assert len(res["configs"]) == 2
        assert res["configs"][1]["recall"] >= res["configs"][0]["recall"]
        assert res["calibrated"][0]["recall"] >= 0.9

    def test_vamana_search_serving_levers(self):
        """Job-spec knobs for the TPU serving levers (sampled build +
        entry sampler + packed serving)."""
        job = dict(executable="vamana_search", **TINY,
                   build_parameters={"graph_max_degree": 16,
                                     "window_size": 32},
                   sampled_entries=True, entry_sampler=True,
                   packed_serving=True,
                   search_window_sizes=[12, 30])
        res = run_job(job)
        assert res["configs"][-1]["recall"] >= 0.9

    def test_ivf_job(self):
        job = dict(executable="ivf_search", **TINY,
                   build_parameters={"num_centroids": 32,
                                     "num_iterations": 3,
                                     "training_fraction": 0.5},
                   n_probes=[2, 32])
        res = run_job(job)
        assert res["configs"][-1]["recall"] >= 0.99

    def test_vamana_dynamic_job(self):
        job = dict(executable="vamana_dynamic", **TINY,
                   build_parameters={"graph_max_degree": 16,
                                     "window_size": 32},
                   num_cycles=2, cycle_fraction=0.1, num_neighbors=5,
                   search_window_size=30)
        res = run_job(job)
        assert len(res["cycles"]) == 2
        for c in res["cycles"]:
            assert c["recall"] > 0.7
            assert c["size"] == 1500
        assert res["qps"] > 0

    def test_vamana_iterator_job(self):
        job = dict(executable="vamana_iterator", **TINY,
                   build_parameters={"graph_max_degree": 16,
                                     "window_size": 32},
                   num_neighbors=5, num_batches=3, max_iterator_queries=4)
        res = run_job(job)
        assert res["batches_per_query"] == 3
        assert res["recall"] > 0.5
        assert res["batches_per_s"] > 0

    def test_inverted_job(self):
        job = dict(executable="inverted_search", **TINY, num_neighbors=5,
                   refinement_epsilons=[0.5, 2.0])
        res = run_job(job)
        assert len(res["configs"]) == 2
        assert res["configs"][1]["recall"] >= res["configs"][0]["recall"]
        assert res["configs"][1]["recall"] > 0.8

    def test_ivf_test_generator(self, tmp_path):
        out_file = str(tmp_path / "ivf_ref.json")
        job = dict(executable="ivf_test_generator", **TINY,
                   build_parameters={"num_centroids": 16,
                                     "num_iterations": 3},
                   num_neighbors=5, n_probes=[2, 16],
                   output_file=out_file)
        res = run_job(job)
        assert os.path.exists(out_file)
        recalls = res["expected"][0]["recalls"]
        assert recalls["16"] >= recalls["2"]

    def test_inverted_test_generator(self):
        job = dict(executable="inverted_test_generator", **TINY,
                   num_neighbors=5, refinement_epsilons=[1.0])
        res = run_job(job)
        assert res["expected"][0]["recalls"]["1.0"] > 0.5

    def test_run_jobs_list(self):
        jobs = [dict(executable="vamana_static_build", **TINY,
                     build_parameters={"graph_max_degree": 16,
                                       "window_size": 32})]
        out = run_jobs(jobs)
        assert len(out) == 1


class TestGoldenRecall:
    """Golden-reference integration: the committed expected-recall file must
    be reproduced within epsilon (reference vamana_reference.toml strategy,
    regenerated by the test_generator executable)."""

    def test_matches_golden(self):
        if not os.path.exists(GOLDEN_PATH):
            pytest.skip("golden file not generated yet")
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
        job = dict(executable="vamana_test_generator",
                   synthetic=golden["dataset"],
                   num_neighbors=golden["num_neighbors"])
        for entry in golden["expected"]:
            job["distances"] = [entry["distance"]]
            bp = {k: v for k, v in entry["build_parameters"].items()
                  if k in ("alpha", "graph_max_degree", "window_size",
                           "max_candidate_pool_size", "prune_to")}
            job["build_parameters"] = bp
            job["search_window_sizes"] = [
                int(w) for w in entry["recalls"]]
            got = run_job(job)["expected"][0]["recalls"]
            for window, want in entry["recalls"].items():
                assert abs(got[window] - want) <= 0.03, (
                    f"{entry['distance']} window {window}: "
                    f"{got[window]} vs golden {want}")

    def test_matches_golden_ivf(self):
        path = os.path.join(GOLDEN_DIR, "ivf_reference.json")
        if not os.path.exists(path):
            pytest.skip("golden file not generated yet")
        with open(path) as f:
            golden = json.load(f)
        for entry in golden["expected"]:
            job = dict(executable="ivf_test_generator",
                       synthetic=golden["dataset"],
                       num_neighbors=golden["num_neighbors"],
                       distances=[entry["distance"]],
                       build_parameters={
                           "num_centroids":
                               entry["build_parameters"]["num_centroids"],
                           "num_iterations": 10},
                       n_probes=[int(p) for p in entry["recalls"]])
            got = run_job(job)["expected"][0]["recalls"]
            for probes, want in entry["recalls"].items():
                assert abs(got[probes] - want) <= 0.03, (
                    f"{entry['distance']} n_probes {probes}: "
                    f"{got[probes]} vs golden {want}")

    def test_matches_golden_inverted(self):
        path = os.path.join(GOLDEN_DIR, "inverted_reference.json")
        if not os.path.exists(path):
            pytest.skip("golden file not generated yet")
        with open(path) as f:
            golden = json.load(f)
        for entry in golden["expected"]:
            job = dict(executable="inverted_test_generator",
                       synthetic=golden["dataset"],
                       num_neighbors=golden["num_neighbors"],
                       distances=[entry["distance"]],
                       max_probes=golden.get("max_probes", 16),
                       refinement_epsilons=[
                           float(e) for e in entry["recalls"]])
            got = run_job(job)["expected"][0]["recalls"]
            for eps, want in entry["recalls"].items():
                assert abs(got[eps] - want) <= 0.03, (
                    f"{entry['distance']} eps {eps}: "
                    f"{got[eps]} vs golden {want}")
