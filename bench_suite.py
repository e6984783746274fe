#!/usr/bin/env python
"""Full benchmark suite: per-family training throughput + SpMM roofline.

Timing methodology (round 4): on the tunneled chip, jax.block_until_ready
can return BEFORE remote execution finishes, and a dispatch costs ~1 ms —
so every number here either chains dependent iterations inside ONE jitted
program (time_chained_op for pure ops, make_multi_train_step for training
steps) and syncs by fetching a value (profiling.force_sync). Earlier
rounds' one-resident-batch "device throughput" rows measured dispatch,
not compute, and are superseded. The end-to-end epoch numbers
(bench_epoch.py) were always value-synced and stand.

Writes BENCH_DETAILS.json with every result; bench.py remains the
single-line headline harness the driver consumes. Run:

  python bench_suite.py [--quick]
"""

import argparse
import json
import os
import sys
import time

from hgnn2_tpu import runtime

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hgnn2_tpu import graphs, profiling  # noqa: E402
from hgnn2_tpu.data import qm9, stats  # noqa: E402
from hgnn2_tpu.nn import ccn as ccn_mod  # noqa: E402
from hgnn2_tpu.nn import models, packed  # noqa: E402
from hgnn2_tpu.ops import sparse  # noqa: E402
from hgnn2_tpu.training import train as train_lib  # noqa: E402
from hgnn2_tpu.training.config import OptimConfig  # noqa: E402
from hgnn2_tpu.training.optim import build_optimizer  # noqa: E402

# Reference floors (BASELINE.md)
REF = {
    "gnn_molecules_per_s": 500.0,  # GNN_simple ~215 s/epoch over 107k molecules
    "lggnn_molecules_per_s": 107108 / 720.0,  # ~149/s (720 s/epoch)
    "ccn1d_molecules_per_s": 107108 / 950.0,  # ~113/s (850-1050 s/epoch)
    "ccn2d_molecules_per_s": 4.3,  # ~2,500 s/epoch over 10,710 molecules
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _train_state(model, batch, lr=3e-4):
    tx = build_optimizer(OptimConfig(optim="adamax", lr=lr), steps_per_epoch=1000)
    return train_lib.TrainState.create(model, batch, tx, jax.random.key(0))


N_INNER = 10  # optimizer steps chained inside one program per dispatch —
# on the tunneled chip a dispatch costs ~1 ms, so per-step timing must
# amortize it (and profiling.force_sync, not block_until_ready, is the
# only honest barrier; see its docstring)


def bench_train_family(name, model, batch, n_mol, steps):
    state = _train_state(model, batch)
    step = train_lib.make_multi_train_step("regression", 0.0, 1.0,
                                           n_inner=N_INNER)
    t0 = time.time()
    state, timing = profiling.time_scan_steps(step, state, batch, steps=steps)
    per_step = timing.per_step_s / N_INNER
    log(f"{name}: {per_step*1e3:.2f} ms/step "
        f"({n_mol} molecules/step; compile+warmup {(time.time()-t0-timing.total_s):.1f}s)")
    return n_mol / per_step


def time_chained_op(fn, x0, n=20):
    """Per-step seconds of x <- fn(x) chained n times INSIDE one jitted
    program (one dispatch, n dependent executions): the only honest
    device-time measurement for sub-ms ops on a high-latency tunnel."""
    import jax as _jax

    @_jax.jit
    def chain(x_):
        def body(xc, _):
            # cast back so mixed-precision ops (bf16 in, f32 accum out)
            # still chain; the cast fuses into the op
            return fn(xc).astype(x_.dtype), None
        out, _ = _jax.lax.scan(body, x_, None, length=n)
        return out

    out = chain(x0)
    profiling.force_sync(out)
    t0 = time.time()
    out = chain(x0)
    profiling.force_sync(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    steps = 10 if args.quick else 30
    results = {}

    BS = 1024 if args.quick else 4096
    records = qm9.synthetic_qm9_like(BS, seed=0)
    n_edges = sum(r.n_dir_edges for r in records)
    n_atoms = sum(r.n_nodes for r in records)
    log(f"dataset: {BS} molecules, {n_atoms} atoms, {n_edges} directed edges")

    # --- GNN_simple flagship (L=15, h=1, J=1) ---------------------------
    batch = graphs.make_dense_batch(records, n_max=32, batch_size=BS, task=0)
    v = bench_train_family(
        "gnn L15", models.GNNSimple(n_features=1, n_layers=15, J=1), batch, BS, steps
    )
    results["gnn_molecules_per_s"] = v

    # --- LGGNN (L=5, h=1, order 2) --------------------------------------
    lg_batch = graphs.make_dense_batch(
        records, n_max=32, m_max=64, with_line_graph=True, batch_size=BS, task=0
    )
    v = bench_train_family(
        "lggnn L5",
        models.GNNLineGraph(n_features=1, n_layers=5, J=1, order=2),
        lg_batch, BS, steps,
    )
    results["lggnn_molecules_per_s"] = v

    # --- CCN-1D (L=20, h=2) and CCN-2D (L=2, h=2) -----------------------
    ccn_bs = BS // 4
    cb = ccn_mod.make_ccn_batch(records[:ccn_bs], k_max=5, task=0,
                                vertex_capacity=1 + 12 * ccn_bs)
    for name, model, key in [
        # the shipped defaults on TPU: fused promotion+contraction Pallas
        # kernels (cli auto-enables them at K<=8); the XLA rows
        # (--no_ccn_kernel) stay for the ratio
        ("ccn1d L20 kernel", ccn_mod.CCN1D(hidden=2, n_layers=20, pallas_kernel=True),
         "ccn1d_molecules_per_s"),
        ("ccn1d L20 xla", ccn_mod.CCN1D(hidden=2, n_layers=20),
         "ccn1d_xla_molecules_per_s"),
        ("ccn2d L2 kernel", ccn_mod.CCN2D(hidden=2, n_layers=2, pallas_kernel=True),
         "ccn2d_molecules_per_s"),
        ("ccn2d L2 xla", ccn_mod.CCN2D(hidden=2, n_layers=2),
         "ccn2d_xla_molecules_per_s"),
    ]:
        state = _train_state(model, cb, lr=1e-3)
        step = train_lib.make_multi_train_step("regression", 0.0, 1.0,
                                               n_inner=N_INNER)
        t0 = time.time()
        state, timing = profiling.time_scan_steps(step, state, cb, steps=steps)
        per_step = timing.per_step_s / N_INNER
        log(f"{name}: {per_step*1e3:.2f} ms/step ({ccn_bs} molecules/step)")
        results[key] = ccn_bs / per_step
        results[key.replace("molecules_per_s", "steps_per_s")] = 1.0 / per_step
    results["ccn2d_kernel_speedup_vs_xla"] = (
        results["ccn2d_molecules_per_s"] / results["ccn2d_xla_molecules_per_s"])
    results["ccn1d_kernel_speedup_vs_xla"] = (
        results["ccn1d_molecules_per_s"] / results["ccn1d_xla_molecules_per_s"])

    # --- fused kernel at its K=8 boundary (random graphs, max degree 7) -
    rng8 = np.random.default_rng(11)
    recs8 = []
    for _ in range(256):
        n8 = int(rng8.integers(10, 17))
        a = np.zeros((n8, n8), np.float32)
        for u in range(n8):  # degree-capped random graph: max degree 7
            for v_ in rng8.permutation(n8)[:3]:
                if u != v_ and a[u].sum() < 7 and a[v_].sum() < 7:
                    a[u, v_] = a[v_, u] = 1.0
        recs8.append(graphs.GraphRecord(
            x=rng8.standard_normal((n8, 3)).astype(np.float32), adj=a,
            y=np.float32(0.1)))
    cb8 = ccn_mod.make_ccn_batch(recs8, task=None, vertex_capacity=4096)
    results["ccn2d_K8_K"] = int(cb8.nbr.shape[1])
    for label, model in [
        ("kernel_", ccn_mod.CCN2D(hidden=2, n_layers=2, pallas_kernel=True)),
        ("xla_", ccn_mod.CCN2D(hidden=2, n_layers=2)),
    ]:
        state = _train_state(model, cb8, lr=1e-3)
        step = train_lib.make_multi_train_step("regression", 0.0, 1.0,
                                               n_inner=N_INNER)
        state, timing = profiling.time_scan_steps(step, state, cb8,
                                                  steps=max(3, steps // 3))
        per_step = timing.per_step_s / N_INNER
        log(f"ccn2d K=8 {label}step: {per_step*1e3:.2f} ms")
        results[f"ccn2d_K8_{label}steps_per_s"] = 1.0 / per_step

    # --- CCN-2D at high K (dense synthetic graphs) ----------------------
    # The regime of exp_ccn2_col.sh where the reference's per-vertex python
    # (and a one-hot chi) blow up: 32-node graphs at edge density 0.9 give
    # receptive fields K ~ 30. The index-form chi keeps memory O(V K^2).
    rng = np.random.default_rng(7)
    dense_recs = []
    n_dense, n_graphs = 32, 64
    for _ in range(n_graphs):
        a = (rng.random((n_dense, n_dense)) < 0.9).astype(np.float32)
        a = np.triu(a, 1)
        a = a + a.T
        xg = rng.standard_normal((n_dense, 3)).astype(np.float32)
        dense_recs.append(graphs.GraphRecord(x=xg, adj=a, y=np.float32(0.1)))
    cbk = ccn_mod.make_ccn_batch(dense_recs, vertex_capacity=n_dense * n_graphs)
    K_high = int(cbk.nbr.shape[1])
    results["ccn2d_highK_K"] = K_high
    # the fused kernel refuses K > 8 by design: its chi application is an
    # unrolled per-lane select-accumulate costing O(K^2) vector ops per
    # (block, k) — at K~30 that is ~2 * 30^3 = 54k VPU ops per block vs
    # ~250 at K=5, past where the select form can win; the scan path's
    # O(V K^2 C) memory bound is what matters in this regime. Recorded so
    # the K boundary is a measured artifact, not a silent cap.
    try:
        from hgnn2_tpu.ops.pallas import ccn_fused as _cf

        _cf.fused_contract_forward(cbk.chi_idx, cbk.nbr,
                                   jnp.zeros(cbk.chi_idx.shape + (2,)),
                                   cbk.deg, cbk.row_mask)
        results["ccn2d_highK_kernel"] = "unexpectedly ran"
    except ValueError as e:
        results["ccn2d_highK_kernel"] = f"refused: {e}"
    for label, model in [
        # materialized 4-D T + gather-form promotion VJP (see nn/ccn.py)
        ("", ccn_mod.CCN2D(hidden=2, n_layers=2)),
        # scan-fused promotion+contract: O(V K^2 C) live memory
        ("scan_", ccn_mod.CCN2D(hidden=2, n_layers=2, scan_promotion=True)),
    ]:
        state = _train_state(model, cbk, lr=1e-3)
        step = train_lib.make_multi_train_step("regression", 0.0, 1.0,
                                               n_inner=N_INNER)
        state, timing = profiling.time_scan_steps(step, state, cbk,
                                                  steps=max(3, steps // 3))
        per_step = timing.per_step_s / N_INNER
        log(f"ccn2d highK {label or 'materialized'} (K={K_high}, "
            f"V={n_dense*n_graphs}): {per_step*1e3:.2f} ms/step "
            f"({n_graphs} graphs/step)")
        results[f"ccn2d_highK_{label}molecules_per_s"] = n_graphs / per_step
        results[f"ccn2d_highK_{label}steps_per_s"] = 1.0 / per_step

    # --- halo partition host-side build at >= 1M edges (VERDICT r3 #10) -
    from hgnn2_tpu.parallel import halo as halo_lib

    Vh, Sh, Eh = 1 << 18, 8, 4_000_000
    hrng = np.random.default_rng(0)
    hsrc = hrng.integers(0, Vh, Eh)
    hdst = (hsrc + hrng.integers(-64, 65, Eh)) % Vh
    far = hrng.random(Eh) < 0.01
    hdst[far] = hrng.integers(0, Vh, int(far.sum()))
    hw = hrng.random(Eh).astype(np.float32)
    t0 = time.time()
    hpart = halo_lib.build_halo_partition(hsrc, hdst, hw, Vh, Sh,
                                          to_device=False)
    build_s = time.time() - t0
    results["halo_partition_build_edges"] = Eh
    results["halo_partition_build_s"] = build_s
    results["halo_partition_build_edges_per_s"] = Eh / build_s
    results["halo_partition_halo_rows_per_shard"] = int(hpart.n_imports)
    log(f"halo partition build: {Eh:,} edges, {Vh:,} nodes, {Sh} shards "
        f"-> {build_s:.2f}s host-side ({Eh/build_s/1e6:.1f}M edges/s)")

    # --- bf16 mixed-precision GNN training step -------------------------
    model_bf16 = models.GNNSimple(n_features=1, n_layers=15, J=1,
                                  dtype=jnp.bfloat16)
    v = bench_train_family("gnn L15 bf16", model_bf16, batch, BS, steps)
    results["gnn_bf16_molecules_per_s"] = v
    results["gnn_bf16_speedup_vs_fp32"] = v / results["gnn_molecules_per_s"]

    # --- SpMM roofline: dense-block fp32/bf16 with MFU, packed-sparse ---
    adj = batch.adj
    F = 128
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BS, 32, F)).astype(np.float32))
    spmm_flops = 2 * BS * 32 * 32 * F

    @jax.jit
    def dense_spmm(adj, x):
        return jnp.einsum("bnm,bmf->bnf", adj, x, preferred_element_type=jnp.float32)

    for dt, label in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        adj_t = adj.astype(dt)
        per_step = time_chained_op(
            lambda xc: dense_spmm(adj_t, xc), x.astype(dt), n=steps)
        fps = spmm_flops / per_step
        key = "dense_block_spmm" + ("" if dt == jnp.float32 else "_bf16")
        results[f"{key}_edges_per_s"] = n_edges / per_step
        results[f"{key}_flops_per_s"] = fps
        u = profiling.mfu(fps, "float32" if dt == jnp.float32 else "bfloat16")
        if u is not None:
            results[f"{key}_mfu"] = u
        log(f"dense-block SpMM {label} (F={F}): {per_step*1e3:.3f} ms "
            f"-> {n_edges / per_step:,.0f} real edges/s, "
            f"{fps/1e12:.2f} padded TFLOP/s"
            + (f", MFU {u:.1%}" if u is not None else ""))

    pb = graphs.make_packed_batch(records, node_capacity=n_atoms + 1,
                                  edge_capacity=n_edges, task=0)
    xp = jnp.asarray(np.random.default_rng(1).standard_normal(
        (pb.num_node_slots, F)).astype(np.float32))

    @jax.jit
    def packed_spmm(src, dst, w, x):
        return sparse.spmm(src, dst, w, x, pb.num_node_slots)

    t_ps = time_chained_op(
        lambda xc: packed_spmm(pb.src, pb.dst, pb.w, xc), xp, n=steps)
    results["packed_spmm_edges_per_s"] = n_edges / t_ps
    log(f"packed segment-sum SpMM (F={F}): {t_ps*1e3:.3f} ms "
        f"-> {results['packed_spmm_edges_per_s']:,.0f} edges/s")

    # HBM roofline for the packed path (VERDICT r2 #6): is segment-sum
    # already bandwidth-bound? Two traffic models bracket reality:
    #   compulsory — every array touched once: 3E idx/w + x read + out write
    #   no-reuse   — the x[dst] gather reads a full row per edge
    V_packed = pb.num_node_slots
    t = t_ps
    b_compulsory = 4 * (3 * n_edges + 2 * V_packed * F)
    b_noreuse = 4 * (3 * n_edges + (n_edges + V_packed) * F)
    u_low = profiling.hbm_utilization(b_compulsory / t)
    u_high = profiling.hbm_utilization(b_noreuse / t)
    results["packed_spmm_hbm_utilization"] = u_low
    results["packed_spmm_hbm_utilization_noreuse_model"] = u_high
    results["packed_spmm_bytes_per_edge_compulsory"] = b_compulsory / n_edges
    if u_low is not None:
        log(f"packed SpMM HBM utilization: {u_low:.1%} (compulsory traffic) "
            f"/ {u_high:.1%} (no-reuse gather model)")

    # XLA cost-analysis bytes (VERDICT r3 #5). NOTE on interpretation:
    # "bytes accessed" counts LOGICAL accesses of the compiled program
    # (re-reads across fused ops included), not achieved DRAM traffic —
    # at this batch size it exceeds what HBM could physically move in the
    # measured time, which PROVES the working set is served from on-chip
    # memory (the HBM roofline does not bind at 44k nodes / 78k edges).
    # The binding-roofline measurement is the at-scale section below.
    def _xla_bytes(fn, *fargs):
        try:
            ca = jax.jit(fn).lower(*fargs).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("bytes accessed", 0.0)) or None
        except Exception as e:  # cost analysis is backend-dependent
            log(f"cost analysis unavailable: {e}")
            return None

    b_logical = _xla_bytes(
        lambda s, d, w_, x_: sparse.spmm(s, d, w_, x_, pb.num_node_slots),
        pb.src, pb.dst, pb.w, xp)
    if b_logical:
        results["packed_spmm_bytes_accessed_xla"] = b_logical
        results["packed_spmm_xla_bytes_over_peak_time"] = (
            profiling.hbm_utilization(b_logical / t))
        log(f"packed SpMM XLA logical bytes: {b_logical/1e6:.1f} MB/step "
            f"({results['packed_spmm_xla_bytes_over_peak_time']:.0%} of what "
            "HBM peak could move in the measured time -> cache-resident)")

    # --- packed SpMM AT SCALE: 1M nodes / 16M edges / F=128 — the x and
    # out arrays are 512 MB each, far beyond on-chip memory, so this IS
    # HBM-bound and the utilization number is a real roofline statement
    Vbig, Ebig = 1 << 20, 16 * (1 << 20)
    rb = np.random.default_rng(5)
    src_b = np.sort(rb.integers(0, Vbig, Ebig)).astype(np.int32)
    dst_b = rb.integers(0, Vbig, Ebig).astype(np.int32)
    w_b = rb.random(Ebig).astype(np.float32)
    x_b = jnp.asarray(rb.standard_normal((Vbig, F)).astype(np.float32))
    sb_, db_, wb_ = jnp.asarray(src_b), jnp.asarray(dst_b), jnp.asarray(w_b)

    tb = time_chained_op(
        lambda xc: sparse.spmm(sb_, db_, wb_, xc, Vbig), x_b,
        n=max(5, steps // 3))
    b_comp_big = 4 * (3 * Ebig + 2 * Vbig * F)
    u_big = profiling.hbm_utilization(b_comp_big / tb)
    results["packed_spmm_large_edges"] = Ebig
    results["packed_spmm_large_nodes"] = Vbig
    results["packed_spmm_large_edges_per_s"] = Ebig / tb
    results["packed_spmm_large_hbm_utilization"] = u_big
    b_xla_big = _xla_bytes(
        lambda s, d, w_, x_: sparse.spmm(s, d, w_, x_, Vbig),
        sb_, db_, wb_, x_b)
    if b_xla_big:
        results["packed_spmm_large_bytes_accessed_xla"] = b_xla_big
        results["packed_spmm_large_hbm_utilization_xla_bytes"] = (
            profiling.hbm_utilization(b_xla_big / tb))
    log(f"packed SpMM at scale (V=1M, E=16M, F={F}): {tb*1e3:.2f} ms "
        f"-> {Ebig/tb/1e9:.2f}G edges/s, compulsory-model HBM utilization "
        f"{u_big:.1%}"
        + (f", XLA-logical-bytes utilization "
           f"{results['packed_spmm_large_hbm_utilization_xla_bytes']:.1%}"
           if b_xla_big else ""))

    # bf16 packed segment-sum: pure-bandwidth path, halving x/out bytes
    w16 = pb.w.astype(jnp.bfloat16)
    t_b16 = time_chained_op(
        lambda xc: packed_spmm(pb.src, pb.dst, w16, xc),
        xp.astype(jnp.bfloat16), n=steps)
    results["packed_spmm_bf16_edges_per_s"] = n_edges / t_b16
    results["packed_spmm_bf16_speedup"] = t / t_b16
    log(f"packed SpMM bf16: {t_b16*1e3:.3f} ms "
        f"({results['packed_spmm_bf16_speedup']:.2f}x fp32)")

    # 128-row multi-molecule dense blocks (VERDICT r2 #5): pack 4 N=32
    # molecules block-diagonally into one 128-row block — the MXU's native
    # tile — and compare fp32 vs bf16 there. 4x the padded FLOPs per
    # molecule, but bf16 gets a shape it can actually tile.
    adj128 = np.zeros((BS // 4, 128, 128), np.float32)
    a_np = np.asarray(batch.adj)
    for g in range(BS):
        blk, off = divmod(g, 4)
        adj128[blk, off * 32:(off + 1) * 32, off * 32:(off + 1) * 32] = a_np[g]
    x128 = np.asarray(x).reshape(BS // 4, 128, F)
    spmm_flops_128 = 2 * (BS // 4) * 128 * 128 * F
    for dt, label in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        adj128_t = jnp.asarray(adj128, dt)
        t1_ = time_chained_op(
            lambda xc: dense_spmm(adj128_t, xc), jnp.asarray(x128, dt),
            n=steps)
        key = "dense_block128_spmm" + ("" if dt == jnp.float32 else "_bf16")
        results[f"{key}_edges_per_s"] = n_edges / t1_
        fps = spmm_flops_128 / t1_
        u = profiling.mfu(fps, "float32" if dt == jnp.float32 else "bfloat16")
        if u is not None:
            results[f"{key}_mfu"] = u
        log(f"dense-block-128 SpMM {label}: {t1_*1e3:.3f} ms "
            f"-> {n_edges / t1_:,.0f} real edges/s"
            + (f", MFU {u:.1%}" if u is not None else ""))
    if results.get("dense_block128_spmm_bf16_edges_per_s"):
        results["dense_block128_bf16_speedup"] = (
            results["dense_block128_spmm_bf16_edges_per_s"]
            / results["dense_block128_spmm_edges_per_s"])

    # (The fused power-layer grad-step comparison lived here until round 5:
    # the Pallas forward lost to XLA at every measured config, including
    # its own best shape — XLA 2.527 ms vs fused 2.807 ms at
    # B=64 N=256 F=H=64 J=2 — so the kernel was retired; see
    # hgnn2_tpu/ops/pallas/__init__.py for the graveyard record.)

    # ratios vs the reference floors
    for k, ref in REF.items():
        if k in results:
            results[f"{k}_vs_reference"] = results[k] / ref
    results["config"] = {"batch": BS, "steps": steps,
                         "device": str(jax.devices()[0])}
    # merge: preserve sections other harnesses own (bench_epoch's "epoch",
    # the fused-layer grad-step rows, ...)
    merged = {}
    if os.path.exists("BENCH_DETAILS.json"):
        with open("BENCH_DETAILS.json") as f:
            merged = json.load(f)
    merged.update(results)
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(merged, f, indent=2, default=float)
        f.write("\n")
    log("wrote BENCH_DETAILS.json")
    for k, v in results.items():
        if isinstance(v, float):
            log(f"  {k}: {v:,.1f}")


if __name__ == "__main__":
    main()
