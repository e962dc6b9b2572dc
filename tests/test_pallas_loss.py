"""Mosaic fused-loss kernels (ops.pallas_loss) vs the XLA vocab-chunk scans.

The kernels are a pure schedule substitution (round-3 VERDICT #2): same
online-softmax / clipped-prob / backward math as ``fused_loss._fwd_impl`` and
``_scan_bwd``, pipelined so the chunk GEMM overlaps the VPU sweep. These
tests run the kernels in interpreter mode on CPU and pin values + gradients
against the scan path (which itself is pinned against materialized logits in
tests/test_fused_loss.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.ops import fused_loss as fl


def _data(n=300, e=128, v=1111, seed=0, pad_frac=0.2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, e)).astype(np.float32))
    wg = jnp.asarray((rng.standard_normal((e, v)) * 0.05).astype(np.float32))
    bg = jnp.asarray((rng.standard_normal((v,)) * 0.01).astype(np.float32))
    labels = rng.integers(1, v, (n,))
    labels[rng.random(n) < pad_frac] = 0
    labels = jnp.asarray(labels.astype(np.int32))
    keep = jnp.asarray((rng.random(n) > 0.25).astype(np.float32))
    m = jnp.asarray((rng.random(n) > 0.15).astype(np.float32))
    return x, wg, bg, labels, keep, m


_CTS = (jnp.float32(0.7), jnp.zeros(()), jnp.float32(1.3), jnp.zeros(()))


def _grad_close(gp, gs, tol):
    for i, name in ((0, "dx"), (1, "dwg"), (2, "dbg")):
        a, b = np.asarray(gp[i], np.float64), np.asarray(gs[i], np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() / scale < tol, (name, np.abs(a - b).max() / scale)
    # mask/label slots: structural zeros either way
    assert gp[3].dtype == gs[3].dtype  # float0
    assert not np.asarray(gp[4]).any() and not np.asarray(gp[5]).any()


class TestKernelVsScan:
    @pytest.mark.parametrize("dtype,scan_block,vtol,gtol", [
        # f32: the exact algorithm pin — reassociation-only deltas
        (jnp.float32, 256, 3e-6, 1e-5),
        # bf16: any reordering of the fp32 GEMM accumulation (row padding,
        # tile decomposition) can flip the bf16 rounding of isolated
        # z/dz elements sitting on a rounding boundary (1 ulp = 2^-8 of the
        # element), and one flipped dz element smears a w-column across a
        # whole dx row. The tolerances bound that ulp-flip amplification
        # (observed ~3e-3 worst-case on dx); algorithm correctness is pinned
        # by the f32 case above.
        (jnp.bfloat16, 512, 5e-5, 5e-3),
    ])
    def test_fwd_bwd_match(self, dtype, scan_block, vtol, gtol):
        args = _data()
        out_p, res_p = fl._pallas_fwd_impl(*args, dtype, True, interpret=True)
        out_s, res_s = fl._fwd_impl(*args, dtype, scan_block, True, stash=False)
        for a, b in zip(out_p, out_s):
            np.testing.assert_allclose(float(a), float(b), rtol=vtol)
        _grad_close(
            fl._pallas_bwd_impl(dtype, True, res_p, _CTS, interpret=True),
            fl._scan_bwd(dtype, scan_block, True, False, res_s, _CTS), gtol)

    def test_ce_only(self):
        args = _data(seed=3)
        out_p, res_p = fl._pallas_fwd_impl(*args, jnp.float32, False,
                                           interpret=True)
        out_s, res_s = fl._fwd_impl(*args, jnp.float32, 256, False,
                                    stash=False)
        for a, b in zip(out_p, out_s):
            np.testing.assert_allclose(float(a), float(b), rtol=3e-6)
        assert float(out_p[2]) == 0.0 and float(out_p[3]) == 0.0
        _grad_close(
            fl._pallas_bwd_impl(jnp.float32, False, res_p, _CTS, interpret=True),
            fl._scan_bwd(jnp.float32, 256, False, False, res_s, _CTS), 1e-5)

    def test_row_padding_inert(self):
        # n=300 pads to 304 with block_n 304? block_n = min(1024, 304) and
        # n_pad == n there — force real padding with a ragged block split
        args = _data(n=272, seed=5)  # block_n = 272 (16-mult), single tile
        out_a, _ = fl._pallas_fwd_impl(*args, jnp.float32, True, interpret=True)
        # same rows replicated + zero-weight filler must give identical sums
        x, wg, bg, labels, keep, m = _data(n=272, seed=5)
        pad = 48
        xp = jnp.concatenate([x, jnp.ones((pad, x.shape[1]))])  # junk rows
        lp = jnp.concatenate([labels, jnp.full((pad,), 7, jnp.int32)])
        kp = jnp.concatenate([keep, jnp.zeros((pad,))])
        mp = jnp.concatenate([m, jnp.zeros((pad,))])
        out_b, _ = fl._pallas_fwd_impl(xp, wg, bg, lp, kp, mp, jnp.float32,
                                       True, interpret=True)
        for a, b in zip(out_a, out_b):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_vocab_not_multiple_of_block(self):
        # v=1111 pads to 1536 with block_v 512: the 425 pad columns must not
        # leak into lse, the clipped sum, or any gradient (covered by the
        # match tests above — this pins the pad-column count arithmetic by
        # comparing against a single-chunk scan where no padding happens)
        args = _data(v=1024, seed=9)
        out_p, _ = fl._pallas_fwd_impl(*args, jnp.float32, True, interpret=True)
        out_s, _ = fl._fwd_impl(*args, jnp.float32, 1024, True, stash=False)
        for a, b in zip(out_p, out_s):
            np.testing.assert_allclose(float(a), float(b), rtol=3e-6)


class TestDispatch:
    def test_custom_vjp_dispatch(self, monkeypatch):
        """use_pallas=True end to end through linear_sce_parts (interpret
        forced so the CPU backend takes the Mosaic path)."""
        monkeypatch.setattr(fl, "_INTERPRET", True)
        x, wg, bg, labels, keep, m = _data()

        def loss(use_pallas):
            def f(x, wg, bg):
                c, cn, r, rn = fl.linear_sce_parts(
                    x, wg, bg, labels, keep, m, jnp.float32, 256, True,
                    False, use_pallas)
                return 0.5 * c / jnp.maximum(cn, 1.0) + 0.5 * r / jnp.maximum(rn, 1.0)
            return f

        vp, gp = jax.value_and_grad(loss(True), argnums=(0, 1, 2))(x, wg, bg)
        vs, gs = jax.value_and_grad(loss(False), argnums=(0, 1, 2))(x, wg, bg)
        np.testing.assert_allclose(float(vp), float(vs), rtol=1e-5)
        for a, b in zip(gp, gs):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-8)
            assert np.abs(a - b).max() / scale < 1e-5

    def test_ineligible_shapes_fall_back(self):
        # CPU backend without the interpret hook: never eligible
        x, wg, *_ = _data()
        assert not fl._pallas_ok(True, x, wg, jnp.float32)
        # tiny N / misaligned E / small V are ineligible even when forced
        assert not fl._pallas_ok(False, x, wg, jnp.float32)

    def test_primal_only_dispatch(self, monkeypatch):
        monkeypatch.setattr(fl, "_INTERPRET", True)
        x, wg, bg, labels, keep, m = _data(seed=11)
        p = fl.linear_sce_parts(x, wg, bg, labels, keep, m, jnp.float32,
                                256, True, False, True)
        s = fl.linear_sce_parts(x, wg, bg, labels, keep, m, jnp.float32,
                                256, True, False, False)
        for a, b in zip(p, s):
            np.testing.assert_allclose(float(a), float(b), rtol=3e-6)


class TestShardedKernel:
    """Round-4 VERDICT #4: the Mosaic loss kernels shard_map over 'data'
    (``fused_loss.linear_sce_parts_sharded``), so the measured N<=4096/chip
    win survives on DP meshes instead of silently reverting to the scans.
    Runs on the conftest-forced 8-device CPU mesh with interpret-mode
    kernels: per-shard rows (2048/8 = 256) sit exactly at the kernel's
    eligibility floor, so the Mosaic path genuinely engages per shard."""

    def _mesh(self):
        from vct_tpu.parallel.mesh import make_mesh

        return make_mesh(data=8, model=1)

    def test_sharded_kernel_matches_scan(self, monkeypatch):
        monkeypatch.setattr(fl, "_INTERPRET", True)
        x, wg, bg, labels, keep, m = _data(n=2048, e=128, v=1111, seed=3)
        mesh = self._mesh()
        # per-shard eligibility really holds (kernel, not scan, per shard)
        assert fl._pallas_ok(True, x[:256], wg, jnp.float32)

        def loss(fn):
            def f(x, wg, bg):
                c, cn, r, rn = fn(x, wg, bg)
                return 0.5 * c / jnp.maximum(cn, 1.0) + 0.5 * r / jnp.maximum(rn, 1.0)
            return f

        def sharded(x, wg, bg):
            return fl.linear_sce_parts_sharded(
                mesh, "data", x, wg, bg, labels, keep, m, jnp.float32, 256,
                True, False, True)

        def scan(x, wg, bg):
            return fl.linear_sce_parts(
                x, wg, bg, labels, keep, m, jnp.float32, 256, True, False,
                False)

        vp, gp = jax.value_and_grad(loss(sharded), argnums=(0, 1, 2))(x, wg, bg)
        vs, gs = jax.value_and_grad(loss(scan), argnums=(0, 1, 2))(x, wg, bg)
        np.testing.assert_allclose(float(vp), float(vs), rtol=1e-5)
        for a, b in zip(gp, gs):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-8)
            assert np.abs(a - b).max() / scale < 1e-5

    def test_auto_dispatch_routes_through_registry(self, monkeypatch):
        """linear_sce_parts_auto consults parallel.mesh.set_kernel_mesh the
        way ops.attention does; the sharded wrapper must actually be taken
        (spy), and only when the opt-in flag is set."""
        from vct_tpu.parallel import mesh as pm

        monkeypatch.setattr(fl, "_INTERPRET", True)
        x, wg, bg, labels, keep, m = _data(n=2048, e=128, v=1111, seed=4)
        mesh = self._mesh()
        calls = []
        real = fl.linear_sce_parts_sharded

        def spy(*a, **k):
            calls.append(1)
            return real(*a, **k)

        monkeypatch.setattr(fl, "linear_sce_parts_sharded", spy)
        pm.set_kernel_mesh(mesh)
        try:
            out_auto = fl.linear_sce_parts_auto(
                x, wg, bg, labels, keep, m, jnp.float32, 256, True, False,
                use_pallas=True, partition_kernels=True)
            assert calls, "registry mesh set but sharded path not taken"
            # without the opt-in flag the plain path runs (no new spy call)
            n_before = len(calls)
            out_plain = fl.linear_sce_parts_auto(
                x, wg, bg, labels, keep, m, jnp.float32, 256, True, False,
                use_pallas=True, partition_kernels=False)
            assert len(calls) == n_before
        finally:
            pm.set_kernel_mesh(None)
        for a, b in zip(out_auto, out_plain):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-5)

    def test_indivisible_rows_raise(self):
        x, wg, bg, labels, keep, m = _data(n=300, e=128, v=1111)
        with pytest.raises(ValueError, match="not divisible"):
            fl.linear_sce_parts_sharded(
                self._mesh(), "data", x, wg, bg, labels, keep, m)

    def test_auto_indivisible_rows_fall_back_to_scan(self, monkeypatch):
        """Rows that don't tile the data axis must NOT fall back to the
        UNSHARDED kernel (a single-device pallas_call cannot be
        auto-partitioned inside a multi-device jit — it dies at lowering);
        the auto dispatcher forces the GSPMD-shardable scan path instead."""
        from vct_tpu.parallel import mesh as pm

        monkeypatch.setattr(fl, "_INTERPRET", True)
        # n=300 is kernel-eligible stand-alone but 300 % 8 != 0
        x, wg, bg, labels, keep, m = _data(n=300, e=128, v=1111, seed=5)
        assert fl._pallas_ok(True, x, wg, jnp.float32)
        seen = []
        real = fl.linear_sce_parts

        def spy(x, wg, bg, labels, keep_ce, m_rce, dtype=jnp.float32,
                block_v=2048, with_rce=True, stash=False, use_pallas=False):
            seen.append(use_pallas)
            return real(x, wg, bg, labels, keep_ce, m_rce, dtype, block_v,
                        with_rce, stash, use_pallas)

        monkeypatch.setattr(fl, "linear_sce_parts", spy)
        pm.set_kernel_mesh(self._mesh())
        try:
            out = fl.linear_sce_parts_auto(
                x, wg, bg, labels, keep, m, jnp.float32, 256, True, False,
                use_pallas=True, partition_kernels=True)
        finally:
            pm.set_kernel_mesh(None)
        assert seen == [False], f"expected forced scan path, saw {seen}"
        ref = real(x, wg, bg, labels, keep, m, jnp.float32, 256, True, False,
                   False)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


class TestVmemGeometry:
    """Round-4 regression: the first real-TPU compile OOMed scoped VMEM
    (17.5 MiB vs the compiler's default 16 MiB stack limit) at a fixed
    block_n=1024. The fix is a raised per-kernel vmem_limit_bytes
    (pallas_loss._VMEM_LIMIT) PLUS a footprint-fit block_n — shrinking
    tiles alone to fit 16 MiB measured ~40% slower than the XLA scans."""

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    @pytest.mark.parametrize("bwd", [False, True])
    @pytest.mark.parametrize("n", [256, 2048, 7936, 65536])
    def test_footprint_within_budget(self, dtype, bwd, n):
        bn = fl._pallas_block_n(n, 768, dtype, bwd)
        est = fl._pallas_vmem_est(bn, 768, jnp.dtype(dtype).itemsize, bwd)
        assert est <= fl._PALLAS_VMEM_BUDGET
        assert bn >= 16 and bn % 16 == 0

    def test_budget_vs_limit_headroom(self):
        # observed Mosaic stack ~= 1.3x the raw-buffer estimate; the budget
        # must keep that under the per-kernel limit
        from vct_tpu.ops.pallas_loss import _VMEM_LIMIT
        assert fl._PALLAS_VMEM_BUDGET * 1.3 <= _VMEM_LIMIT

    def test_production_tiles_are_full_width(self):
        # the production shapes must not silently fall to crippled tiles
        for bwd in (False, True):
            assert fl._pallas_block_n(7936, 768, jnp.bfloat16, bwd) == 1024

    def test_chooser_shrinks_when_oversized(self):
        # a wide embedding must shrink rows until the footprint fits (the
        # w-tile term is bn-independent, so pick a width where it can)
        bn = fl._pallas_block_n(7936, 4096, jnp.float32, True)
        est = fl._pallas_vmem_est(bn, 4096, 4, True)
        assert bn < 1024 and est <= fl._PALLAS_VMEM_BUDGET
