from .runner import (BenchmarkDispatcher, run_job, run_jobs,
                     register_executable)

__all__ = ["BenchmarkDispatcher", "run_job", "run_jobs",
           "register_executable"]
