"""The weak-scaling protocol harness must run mechanically on the virtual
mesh and its comm-volume accounting must match the analytic formula EXACTLY
(VERDICT r2 item 5 + r3 weak #5 — replaces the last unproven piece of
GPy/core/sparse_gp_mpi.py:90-115 parity)."""
import numpy as np

from benchmarks.multihost_scaling import (collective_bytes,
                                          iterative_weak_scaling,
                                          svgp_weak_scaling)


def test_svgp_weak_scaling_and_comm_volume_exact():
    art = svgp_weak_scaling(chips=(1, 2, 4), rows_per_chip=256,
                            batch_per_chip=64, M=16, D=2, steps=3)
    ks = [r["chips"] for r in art["results"]]
    assert ks == [1, 2, 4]
    for r in art["results"]:
        assert r["step_ms"] > 0 and 0 < r["efficiency"] < 4.0
    # EXACT comm model: the step explicitly psums (packed flat gradient,
    # ELBO scalar) as its only collective — |raw| + 1 floats, nothing else
    measured = art["comm_bytes_per_step"]["all-reduce"]
    formula = art["comm_formula_bytes"]
    assert measured == formula, (measured, formula)
    assert art["comm_formula_exact"] is True
    assert art["comm_bytes_per_step"]["all-to-all"] == 0
    assert art["comm_bytes_per_step"]["collective-permute"] == 0
    assert art["comm_bytes_per_step"]["all-gather"] == 0


def test_svgp_comm_volume_independent_of_batch():
    """The per-step collective payload must not grow with the local batch:
    only the packed gradient + ELBO scalar cross chips, never data rows."""
    from benchmarks.multihost_scaling import svgp_step_comm_bytes

    c1, raw1 = svgp_step_comm_bytes(n_chips=4, batch_per_chip=32)
    c2, raw2 = svgp_step_comm_bytes(n_chips=4, batch_per_chip=128)
    assert raw1 == raw2
    itemsize = 8  # x64 test env
    for c in (c1, c2):
        assert c["all-reduce"] == raw1 + itemsize, (c, raw1)
    assert c1["total"] == c2["total"]


def test_iterative_weak_scaling_comm_is_vectors_not_gram():
    art = iterative_weak_scaling(chips=(1, 2), rows_per_chip=128, D=2,
                                 max_cg=4, n_probes=2, block=64)
    assert [r["chips"] for r in art["results"]] == [1, 2]
    # collectives move O(N * R) vectors per CG iteration, never the O(N^2)
    # Gram: total payload across the whole program must be far below N^2
    n_total = art["results"][-1]["gram_rows"]
    gram_bytes = n_total * n_total * 8
    assert 0 < art["comm_bytes_per_step"]["total"] < gram_bytes
    # sharding-overhead metric (VERDICT r3 weak #5a): sharded k-device run
    # vs the SAME problem unsharded on 1 device — on the shared-core
    # virtual mesh this must stay O(1) (it is NOT the old 0.18-style
    # conflation of work growth with parallel overhead)
    for r in art["results"]:
        assert r["unsharded_1dev_ms"] > 0
        assert 0 < r["sharding_overhead"] < 10.0
        assert "work_normalized_efficiency" in r


def test_collective_bytes_parser():
    hlo = """
  %all-reduce.1 = f32[258]{0} all-reduce(f32[258]{0} %x), replica_groups={}
  %ag = (f32[16,4]{1,0}) all-gather(f32[8,4]{1,0} %y), dimensions={0}
  %notacoll = f32[99]{0} add(f32[99]{0} %a, f32[99]{0} %b)
"""
    out = collective_bytes(hlo)
    assert out["all-reduce"] == 258 * 4
    assert out["all-gather"] == 16 * 4 * 4
    assert out["total"] == 258 * 4 + 256


def test_collective_bytes_parser_async_counted_once():
    """-start/-done pairs are ONE collective (counting both doubled the r3
    artifact's payload numbers)."""
    hlo = """
  %ars = f32[100]{0} all-reduce-start(f32[100]{0} %x), replica_groups={}
  %ard = f32[100]{0} all-reduce-done(f32[100]{0} %ars)
"""
    out = collective_bytes(hlo)
    assert out["all-reduce"] == 100 * 4
