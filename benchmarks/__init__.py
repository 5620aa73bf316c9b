"""Benchmark harnesses (parity surface for the reference's benchmarks/)."""
