from .suite import BenchResult, run_bench, time_fn

__all__ = ["run_bench", "time_fn", "BenchResult"]
