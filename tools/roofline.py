"""Roofline accounting for the fused Pallas chunk kernels.

Per-kernel FLOP and VMEM-traffic counts are derived statically from the
kernel structure (the per-plane operation lists below mirror the update
functions in prost_tpu/ops/fused_*.py line by line) and combined with
measured iteration rates into achieved-vs-peak fractions.

Two rates per kernel (round 3, both serial-chain measured —
tools/probe_timing.py):

* KERNEL-ONLY (tools/kernel_rates.py): the chunk kernel in a
  dependency-chained lax.while_loop, nothing else — the number the
  utilization columns use.
* END-TO-END (bench.py): the full solver path (scalar adaptation,
  stopping, state pytree).  After the round-3 plane-carry restructure
  the end-to-end rate sits at 90-97% of kernel-only for every structure;
  the residual gap is per-chunk dispatch + the while_loop step.

Peaks (TPU v5e, one chip):
  * MXU bf16: 197 TFLOP/s (published).  These kernels do not use the MXU
    (stencil/pointwise work — no contractions), so the relevant ceilings
    are the VPU and VMEM.
  * VPU f32: derived from the published MXU number — 197e12 / (4 MXUs x
    128x128 x 2 flops) = ~1.5 GHz core clock; VPU = (8 sublanes x 128
    lanes) x 4 ALUs x clock = ~6.2 TFLOP/s f32.  "VPU ops" counts below
    include rolls (lane shifts) and selects (mask applications), which
    occupy VPU issue slots without being FLOPs.
  * VMEM bandwidth: ~20x HBM (scaling-book rule of thumb) = ~16 TB/s.
    The working set of a 512x512 f32 plane (1 MB) far exceeds vector
    registers, so every plane-level operation reads/writes VMEM unless
    Mosaic fuses the expression chain; the plane-touch counts below are
    the *fused lower bound* (live state reads + output writes only).
  * HBM 819 GB/s (published) — touched once per residual_iter CHUNK (one
    load + one store of the state planes), not per iteration: at ri=10,
    512x512 ROF moves 7 MB per 46 us chunk = 152 GB/s, 19% of HBM peak
    and fully overlapped; HBM is NOT the bound.  This is the design: the
    reference streams ~25 MB of HBM per iteration, these kernels per ten.

Usage: python tools/roofline.py [name=end_to_end_its_per_sec ...]
(defaults below are the round-3 serial-chain kernel-only rates; pass
bench.py's end-to-end numbers to see the solver-path utilization).
"""

import sys

VPU_F32_PEAK = 6.2e12   # derived above
VMEM_BW = 16e12         # ~20x HBM, rule of thumb
HBM_BW = 819e9

# kernel-only it/s, tools/kernel_rates.py on the v5e, 2026-08-21
# (round-5 session with the maskless-adjoint cores; ml read 117.0k in
# the ml_ab_probe session — both kept for the dispersion record)
KERNEL_RATES = {
    "rof512": 248100.0,
    "tvl1_512": 217800.0,
    "ml256x8": 105200.0,
    "tight128x4": 297500.0,
    "deblur512": 46100.0,
    "vol256x8": 77100.0,
}


def counts_rof(nx, ny):
    """fused_rof._rof_update, dataterm='square', per pixel per iteration
    (round-5 maskless-adjoint form): kty = dxt+dyt+add (2 rolls, 0
    selects — the dead-dual invariant makes the bare roll-subtract
    exact, _shift_ops maskless_adjoint; was 4 selects); arg (2); affine
    data prox (2); dx+dy of x_new (2 rolls, 2 selects, 2 arith);
    extrapolated dual args (8); ball projection (6 arith incl. rsqrt);
    scaled writes (2)."""
    flops = 29          # arithmetic only (kty lost 2 masked-operand adds)
    vpu_ops = 29 + 4 + 2  # + rolls + selects (6 selects -> 2)
    planes_lb = 11      # reads: x,qx,qy,gx,gy,dt0 | writes: x2,qx2,qy2,gx2,gy2
    return nx * ny, flops, vpu_ops, planes_lb


def counts_ml(nx, ny, L):
    """fused_multilabel._ml_update per pixel (L labels): label-axis
    stencil adjoints 8L, positivity prox 3L, stencils 4L, label sum L,
    dual args 8L, 2L-ball 4L+3, scaled writes 2L, s-update 5."""
    flops = 30 * L + 8
    # round-5 maskless adjoints: 6L selects -> 2L (dx/dy keep theirs)
    vpu_ops = flops + 4 * L + 2 * L + 8  # rolls + remaining selects
    planes_lb = 11 * L + 4
    return nx * ny, flops, vpu_ops, planes_lb


def counts_tight(nx, ny, L, k):
    """fused_tight update per pixel: ktyu 8L, ktyv 10k, proxes 3L+4k,
    forward products 4L+L+8k+2L, free dual 8L, pair ball 16k+5."""
    flops = 26 * L + 38 * k + 5
    vpu_ops = flops + 6 * L + 4 * k
    planes_lb = 10 * L + 12 * k + 3
    return nx * ny, flops, vpu_ops, planes_lb


def counts_deblur(nx2, ny2, taps):
    """fused_deblur update per (nx2, ny2) pixel: conv adjoint 2T+1,
    gradient adjoints 6, primal 2, conv fwd 2T, stencils 4, conv-dual
    update 7, ball 14.

    Why this kernel's %VPU(flops) is intrinsically the lowest: each conv
    apply is 2T rolls (diagonal motion taps need a row AND a column
    shift) — 4T rolls/iter vs the gradient family's 4-8 — and a roll
    occupies issue slots without counting as a FLOP.  Round-3 serial
    A/B of the tap-sum association (pairwise tree vs serialized left
    fold): 226 vs 241 us/chunk, 6% — so the kernel is ISSUE-bound on
    rolls, not latency-bound (the round-2 latency hypothesis came from
    the broken host-loop probe).  Per-iteration cost vs ROF matches the
    roll ratio: 22.3 us/iter with ~32 rolls vs ROF's 4.6 us with 8."""
    flops = 4 * taps + 38
    vpu_ops = flops + 4 * taps + 8
    planes_lb = 14
    return nx2 * ny2, flops, vpu_ops, planes_lb


def counts_vol(L, nx, ny):
    """fused_vol._vol_update per voxel: kty 3 adjoint stencils (3 rolls,
    6 selects, 5 arith), data prox 4, three fwd stencils (3 rolls, 5
    selects, 6 arith), dual args 12, 3-ball 8, scaled writes 3."""
    flops = 38
    vpu_ops = flops + 6 + 11
    planes_lb = 15  # reads u,q(3),g(3),f | writes u2,q2(3),g2(3)
    return L * nx * ny, flops, vpu_ops, planes_lb


def report(name, px, flops_px, vpu_px, planes_lb, its_per_sec):
    t_iter = 1.0 / its_per_sec
    fl = px * flops_px
    achieved = fl / t_iter
    vpu_rate = px * vpu_px / t_iter
    vmem = px * planes_lb * 4 / t_iter
    print(f"| {name} | {its_per_sec/1e3:.1f}k | {fl/1e6:.1f} MF | "
          f"{achieved/1e12:.2f} | {100*achieved/VPU_F32_PEAK:.0f}% | "
          f"{100*vpu_rate/VPU_F32_PEAK:.0f}% | {vmem/1e12:.1f} | "
          f"{100*vmem/VMEM_BW:.0f}% |")


def chunk_decomposition(name, px, planes_in, planes_out, ri, its_per_sec,
                        t_kernel=None):
    """End-to-end chunk time = in-kernel time (serial-chain measured) +
    dispatch/XLA glue; the whole-plane kernels' HBM state in/out streams
    overlap the VMEM compute (shown for scale)."""
    t_chunk = ri / its_per_sec
    hbm_bytes = (planes_in + planes_out) * px * 4
    t_hbm = hbm_bytes / HBM_BW
    line = (f"{name}: chunk {1e6*t_chunk:.0f} us; HBM state in/out "
            f"{1e6*t_hbm:.0f} us ({hbm_bytes/1e6:.0f} MB @ 819 GB/s, "
            f"overlapped)")
    if t_kernel is not None:
        t_glue = t_chunk - t_kernel
        line += (f"; in-kernel {1e6*t_kernel:.0f} us "
                 f"+ dispatch/glue {1e6*t_glue:.0f} us")
    print(line)


def main(argv):
    meas = dict(KERNEL_RATES)
    for a in argv:
        k, v = a.split("=")
        meas[k] = float(v)

    print("| kernel | it/s | FLOP/iter | TFLOP/s | %VPU(flops) | "
          "%VPU(ops) | VMEM TB/s (lb) | %VMEM |")
    print("|---|---|---|---|---|---|---|---|")
    report("ROF 512x512", *counts_rof(512, 512), meas["rof512"])
    report("multilabel 256x256x8", *counts_ml(256, 256, 8), meas["ml256x8"])
    report("tight 128x128x4 (k=6)", *counts_tight(128, 128, 4, 6),
           meas["tight128x4"])
    report("deblur 512x512 (T=7)", *counts_deblur(520, 520, 7),
           meas["deblur512"])
    report("vol 8x256x256", *counts_vol(8, 256, 256), meas["vol256x8"])
    print()
    # ROF chunk: reads x + q(2) + f (w dead for square), writes
    # x2 + q2(2) + x_prev + q_prev(2); kernel-only 46 us (round 3)
    chunk_decomposition("ROF 512x512 ri=10", 512 * 512, 4, 6, 10,
                        meas["rof512"],
                        t_kernel=10.0 / KERNEL_RATES["rof512"])
    print()
    admm_banded_bound(2048, 2048, n_bands=16, halo=24,
                      admm512_its=meas.get("admm512", 43.6e3),
                      measured=meas.get("admm2048"))
    print()
    rof_banded_bound(2048, 2048, n_bands=8, halo=24, ri=10,
                     rof512_its=meas["rof512"],
                     measured=meas.get("rof2048"))
    return 0


def rof_banded_bound(nx, ny, n_bands, halo, ri, rof512_its, measured=None):
    """Same joint-ceiling accounting for `rof_fused_multichunk_banded`
    (fused_rof.py:1177).  Unlike the ADMM kernel its windows are fetched
    once per CHUNK of ri iterations (state stays VMEM-resident for the
    chunk), so DMA amortizes ri-fold and the compute ceiling (512^2
    per-pixel rate x the ext/rows halo-recompute factor) is the only
    one that binds."""
    rows = nx // n_bands
    ext = min(rows + 2 * halo, nx)
    t_px = 1.0 / (rof512_its * 512 * 512)
    t_compute = n_bands * ext * ny * t_px
    dma_bytes = n_bands * (4 * ext + 6 * rows) * ny * 4  # per ri-chunk
    t_dma = dma_bytes / HBM_BW / ri                      # per iteration
    pixel_linear = 1.0 / (nx * ny * t_px)
    joint = 1.0 / max(t_compute, t_dma)
    print(f"ROF banded-multichunk {nx}x{ny} nb={n_bands} (rows={rows}, "
          f"ext={ext}, halo recompute x{ext/rows:.3f} per chunk):")
    print(f"  pixel-linear of the 512^2 rate: {pixel_linear/1e3:.2f}k it/s")
    print(f"  compute ceiling {1/t_compute/1e3:.2f}k it/s; DMA "
          f"{dma_bytes/1e6:.0f} MB/chunk -> {1/t_dma/1e3:.2f}k it/s "
          f"(amortized over ri={ri}, fully hidden)")
    if measured:
        print(f"  measured {measured/1e3:.2f}k it/s = "
              f"{100*measured/joint:.0f}% of the joint bound; the residual "
              f"gap is band-boundary SMEM adaptation + pipeline fill")


def admm_banded_bound(nx, ny, n_bands, halo, admm512_its, measured=None):
    """Joint compute/DMA ceiling of `admm_banded_chunk` (fused_admm.py:812)
    and the decomposition of its gap to pixel-linear scaling.

    The banded kernel refetches every band's halo-extended window each
    ITERATION (unlike the ROF-family chunk kernels, whose state is
    VMEM-resident for a whole chunk), so it has two independent ceilings:

    * compute: the whole-plane 512^2 ADMM per-pixel rate applied to the
      halo-EXTENDED pixels actually computed (ext/rows recompute factor);
    * DMA: 9 ext-row planes in (xh,xp,xd,warm, zh x2, zd x2, f) + 8
      owned-row planes out per band per iteration at HBM_BW, overlapped
      with compute by the double-buffered pipeline.

    The joint bound is min(ceilings); pixel-linear scaling of the 512^2
    rate is NOT reachable by ANY banded schedule — the designed halo
    recompute alone forbids it.  The compute ceiling is a PROXY read
    off the 512^2 whole-plane e2e rate: the 2048-lane band windows can
    compute more efficiently per pixel than that 512-wide kernel, so
    measured rates may exceed it (quiet-window BENCH_ALL_r05: 2.18k =
    110% of the proxy, 80% of pixel-linear) — treat it as a
    conservative anchor, not a hard wall."""
    rows = nx // n_bands
    ext = min(rows + 2 * halo, nx)
    px_512 = 512 * 512
    t_px = 1.0 / (admm512_its * px_512)          # s per pixel-iteration
    t_compute = n_bands * ext * ny * t_px        # s per banded iteration
    dma_bytes = n_bands * (9 * ext + 8 * rows) * ny * 4
    t_dma = dma_bytes / HBM_BW
    pixel_linear = 1.0 / (nx * ny * t_px)
    joint = 1.0 / max(t_compute, t_dma)
    print(f"ADMM banded {nx}x{ny} nb={n_bands} (rows={rows}, ext={ext}, "
          f"halo recompute x{ext/rows:.3f}):")
    print(f"  pixel-linear of the 512^2 rate: {pixel_linear/1e3:.2f}k it/s "
          f"(unreachable by design)")
    print(f"  compute ceiling {1e6*t_compute:.0f} us/iter = "
          f"{1/t_compute/1e3:.2f}k it/s; DMA ceiling {dma_bytes/1e6:.0f} "
          f"MB/iter -> {1e6*t_dma:.0f} us = {1/t_dma/1e3:.2f}k it/s")
    print(f"  joint bound {joint/1e3:.2f}k it/s "
          f"({100*joint/pixel_linear:.0f}% of pixel-linear)")
    if measured:
        print(f"  measured {measured/1e3:.2f}k it/s = "
              f"{100*measured/joint:.0f}% of the joint bound "
              f"({100*measured/pixel_linear:.0f}% of pixel-linear)")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
