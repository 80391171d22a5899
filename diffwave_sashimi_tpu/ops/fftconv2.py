"""Layout-native fused FFT convolution, v2: the S4 global conv as four
standard MXU matmuls with zero transposes and zero in-kernel data movement.

The v1 kernel (ops/fftconv_pallas.py) is issue-bound: per (batch, channel)
it chains ~12 small dependent matmuls whose spectrum tensors carry a
K2 = N2/2+1 = 129 lane dimension (padded to 256 lanes by the VMEM tiling —
2x wasted MXU time on the two middle stages), and its channel-batched
variant loses its gains to XLA-side layout transposes plus in-kernel
lane<->sublane swaps.

v2 removes all of that by CHOOSING THE ACTIVATION LAYOUT to fit the
dataflow.  With n = R*S and time split t = t1*S + t2 (t1 "major", t2
"minor"), activations are stored COMPACTLY as (B, S, H, Rc): sublane-major
axis t2, then channel, then a lane axis t1 in [0, Rc) with Rc*S >= L
(e.g. L=16000 -> n=32768, R=256, S=128, Rc=128).  The channel sits INSIDE
the sublane dimension so that every stage of the transform chain is a
plain matmul on a freely-reshaped 2-D view — no swapaxes, no relayouts:

    S1  A[(t2 h), kr] = sum_t1 u[(t2 h), t1] W_R^{t1 kr}   (S*HB, Rc)@(Rc, R)
    tw  B = A * W_n^{t2 kr}              elementwise, (S, 1, R) broadcast
    S2  X[ks, (h kr)] = sum_t2 B...      (Q, S)@(S, HB*R)   const-lhs
    *   Y = X * K_hat                    elementwise
    iA  Z[t2, (h kr)] = sum_ks Y...      (S, Q)@(Q, HB*R)   const-lhs
    tw  T = Z * W_n^{-t2 kr}
    iB  y[(t2 h), t1] = Re sum_kr T...   (S*HB, R)@(R, Rc)

The (S, HB, R) <-> (S*HB, R) and (S, HB*R) views are pure reshapes of the
leading (sublane-side) dims — free.  The output comes back in EXACTLY the
input layout, so activations stay in this layout across the whole S4 block
and the sampling step; channel ops (1x1 convs, channel LayerNorm) contract
the (-2) channel axis directly, and pool reshapes touch only sublane dims.

Spectrum bookkeeping: the half spectrum k = kr + R*ks needs ks in
[0, S/2) with FULL kr range, plus the single Nyquist bin k = n/2
(ks = S/2, kr = 0).  The Nyquist bin is folded into the SAME matmuls by
extending the spectrum tile to Q = S/2 + 1 rows: the extra row's DFT/iDFT
factors are exactly (+-1)^{t2}, and the above-Nyquist aliases in that row
(kr > 0) are killed by the c-scale mask folded into the kernel spectrum.
(An earlier revision special-cased the Nyquist bin as a rank-1 VPU fixup
with (HB, 1, 1)-shaped scalars; that crashed the Mosaic compiler's layout
inference — "arr.size() >= layout_rank" — and was slower anyway.)

The irfft's conjugate-symmetry scale c_k (2/n, except 1/n at k=0 and n/2,
0 above Nyquist) is folded into the kernel spectrum at build time
(kernel_spectrum), so the multiply stage is a plain complex product.

Zero-skip: the input's valid region t < L means lanes t1 >= Rc are never
stored and S1 contracts only K = Rc; the output is only needed for
t < Rc*S so iB emits N = Rc lanes.  Total matmul cost ~8*n*(Rc + S) per
channel — minimized by S ~ sqrt(L) (hence R = n/S = 256 at the 16k tier).

Reference parity point: this computes the same values as the reference's
FFT convolution (reference models/s4.py:1403-1406) with the kernel's
irfft/scale algebra folded in, for the rebuild's power-of-two FFT size.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


class Layout(NamedTuple):
    """Static per-tier layout: n = R*S, compact lanes Rc (Rc*S >= L)."""
    n: int      # FFT size (power of two)
    R: int      # major factor = spectrum kr lanes
    S: int      # minor factor = sublane rows (t2)
    Rc: int     # compact lane count (t1 < Rc stored; Rc*S >= L)
    L: int      # valid sample count (t < L)
    HB: int     # channels per kernel program
    bf16: bool = False  # bf16 in-kernel temporaries (halves VMEM)
    BB: int = 1  # batch items per program (independent chains -> ILP)

    @property
    def Lc(self) -> int:
        return self.Rc * self.S

    @property
    def Q(self) -> int:
        """Spectrum sublane rows: ks in [0, S/2] inclusive (Nyquist row)."""
        return self.S // 2 + 1


def default_R(n: int) -> int:
    """Layout-family major factor for FFT size n.

    R is shared by EVERY tier of a network (a UNet tier pooled by p then
    has exactly the parent layout with S/p and the same Rc, so pooling is
    a pure sublane reshape) — so it must be derived from the TOP tier's n
    and threaded down (S4.v2_R).  R=256 is the measured winner at the
    SaShiMi 16k tiers on v5e (scripts/conv_bench.py); for longer top
    tiers (n > 2^16, e.g. the 44000-sample LJSpeech-harder point) S is
    capped at 256 by growing R, which keeps the S-sized DFT constants and
    (S*HB, R) temporaries inside the 16 MB scoped-VMEM frame where the
    fixed-R=256 family (S = n/256 >= 512) cannot fit."""
    return max(min(256, n // 8), n // 256)


def _frame_bytes(S: int, R: int, Rc: int, Q: int, hb: int, itm: int,
                 BB: int) -> int:
    """Estimated per-program VMEM frame: double-buffered io tiles +
    kernel-spectrum tiles + ~6 live (S*HB, R) temporaries + DFT
    constants.  Mosaic's true frame runs ~1.4x this (extra pipeline
    buffers); the 12 MB budget below keeps the observed frame under the
    16 MB scoped-vmem limit."""
    io = 4 * S * hb * Rc * itm * BB     # in+out, double-buffered
    kf = 2 * Q * hb * R * 4             # spectrum pair (f32)
    tmps = 6 * S * hb * R * itm * BB
    consts = (4 * Rc * R + 4 * S * R + 8 * Q * S + S * Rc) * 4
    return io + kf + tmps + consts


_FRAME_BUDGET = 12 * 2 ** 20


def choose_layout(L: int, n: int, H: int, R: Optional[int] = None,
                  HB: Optional[int] = None, bf16: bool = False,
                  BB: Optional[int] = None) -> Layout:
    """Pick (R, S, Rc, HB, BB) for a tier.  Total matmul cost scales as
    ~8*n*(Rc + S) per channel with Rc ~= L/S, so S ~ sqrt(L) minimizes
    FLOPs; lane dims (R, Rc) want to be multiples of 128.

    R defaults to the n-derived family factor (see :func:`default_R`);
    networks whose tiers must share one layout thread the top tier's R
    explicitly.  BB=None auto-pairs with HB (see below); the launch path
    downgrades BB to 1 at trace time when the batch doesn't divide it."""
    assert n & (n - 1) == 0 and n >= 256, n
    if R is None:
        R = default_R(n)
    S = n // R
    Rc = -(-L // S)  # ceil: lanes needed to cover L
    # round Rc up to a power of two (tile-friendly), capped at R
    Rc = 1 << (Rc - 1).bit_length()
    Rc = min(Rc, R)
    assert Rc * S >= L, (Rc, S, L)
    Q = S // 2 + 1
    itm = 2 if bf16 else 4

    def frame(hb: int, bb: int) -> int:
        return _frame_bytes(S, R, Rc, Q, hb, itm, bb)

    if HB is None and BB is None and H % 16 == 0 and 16 * S <= 2048 \
            and frame(16, 2) <= _FRAME_BUDGET:
        # Forced sweep past the frame-budget heuristic (conv_interleave_
        # sweep.py on v5e 2026-08-19, B=16 gelu_d, within one run): the
        # deeper HB16/BB2 interleave wins where its frame fits — tier2
        # (S=32) 0.875 ms vs 0.995 at HB8/BB2, tier3 (S=8) 0.669 vs
        # 0.731 at the old HB32/BB1 growth pick.  Tier1 (S=128) exceeds
        # the budget at HB16 (and Mosaic crashed compiling it when
        # forced) so it keeps HB8/BB2 below.
        HB, BB = 16, 2
    elif HB is None and BB is None and S >= 16 and H % 8 == 0 \
            and frame(8, 2) <= _FRAME_BUDGET:
        # Measured sweet spot on v5e (/tmp/bbhb_sweep.log 2026-08-17,
        # B=16 gelu_d): TWO independent batch chains at HB=8 let Mosaic
        # overlap one chain's VPU stages (twiddles, kernel multiply,
        # GELU) with the other's MXU time — tier1 (S=128) 1.60 ms vs
        # 1.91 at the old HB16/BB1 pick, tier2 (S=32) 0.48 vs 0.77 at
        # HB32/BB1.
        HB, BB = 8, 2
    if BB is None:
        BB = 1
    if HB is None:
        # HB*S <= 2048, HB <= 32 is the measured sweet spot on v5e with
        # the bf16 inter-stage chain (/tmp/hb_sweep.py 2026-08-17: tier1
        # HB=16 -21%, tier2/3 HB=32 -17%/-22% vs the old HB*S <= 512
        # picks).  Long tiers shrink to fit the frame budget — straight
        # to HB=1: 1 < HB < 8 puts a sub-tile sublane dim in the middle
        # of every (S, HB, R) temporary, which Mosaic pads 4-8x (and has
        # crashed its vector layout pass); HB=1 runs an all-2-D chain.
        HB = 8
        if frame(HB, BB) > _FRAME_BUDGET or H % HB != 0:
            HB = 1
        while 1 <= HB < 32 and H % (HB * 2) == 0 \
                and frame(HB * 2, BB) <= _FRAME_BUDGET \
                and (HB * 2) * S <= 2048:
            HB *= 2
        if HB in (2, 4):
            HB = 1
    assert H % HB == 0, (H, HB)
    return Layout(n=n, R=R, S=S, Rc=Rc, L=L, HB=HB, bf16=bf16, BB=BB)


def layout_feasible(lay: Layout) -> bool:
    """True when the fused kernels can run this layout: the VMEM frame
    fits at the chosen HB and the sublane factor S holds at least one
    f32 tile row block."""
    itm = 2 if lay.bf16 else 4
    return (lay.S >= 8
            and _frame_bytes(lay.S, lay.R, lay.Rc, lay.Q, lay.HB, itm,
                             lay.BB) <= _FRAME_BUDGET)


def to_compact(x: jnp.ndarray, lay: Layout) -> jnp.ndarray:
    """(B, H, L') flat time -> (B, S, H, Rc) compact layout (L' <= Rc*S)."""
    B, H, Lx = x.shape
    assert Lx <= lay.Lc, (Lx, lay)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, lay.Lc - Lx)))
    x = x.reshape(B, H, lay.Rc, lay.S)       # t1 (major), t2 (minor)
    return jnp.transpose(x, (0, 3, 1, 2))    # (B, S, H, Rc)


def from_compact(xc: jnp.ndarray, lay: Layout, L: Optional[int] = None
                 ) -> jnp.ndarray:
    """(B, S, H, Rc) -> (B, H, L) flat time."""
    B, _, H, _ = xc.shape
    x = jnp.transpose(xc, (0, 2, 3, 1)).reshape(B, H, lay.Lc)
    return x[..., :lay.L if L is None else L]


# Opt-in int8 MXU mode for the EVAL fused conv (sampling path only): the
# four DFT/iDFT stages run int8 x int8 -> int32 dots (v5e int8 MXU is 2x
# bf16: 394 TOPS), with per-tensor static scales on the constant factor
# matrices and a fresh dynamic per-stage scale on each activation.
# Quality-gated opt-in (see scripts/int8_check.py + BASELINE.md); enable
# per-process via set_int8 or per-call via the int8= kwarg.
INT8 = {"enabled": False}


def set_int8(enabled: bool) -> None:
    INT8["enabled"] = bool(enabled)


@functools.lru_cache(maxsize=32)
def _consts(lay: Layout):
    """f32 numpy factor matrices for the layout (host constants)."""
    n, R, S, Rc, L = lay.n, lay.R, lay.S, lay.Rc, lay.L
    Q = lay.Q
    t1 = np.arange(Rc)
    kr = np.arange(R)
    t2 = np.arange(S)
    ks = np.arange(Q)
    Dr = np.exp(-2j * np.pi * np.outer(t1, kr) / R)      # (Rc, R)
    tw = np.exp(-2j * np.pi * np.outer(t2, kr) / n)      # (S, R)
    Ds = np.exp(-2j * np.pi * np.outer(ks, t2) / S)      # (Q, S)
    Es = np.exp(2j * np.pi * np.outer(t2, ks) / S)       # (S, Q)
    twm = np.exp(2j * np.pi * np.outer(t2, kr) / n)      # (S, R)
    Er = np.exp(2j * np.pi * np.outer(kr, t1) / R)       # (R, Rc)
    # valid-sample mask in (t2, t1) coordinates: t = t1*S + t2 < L
    mask = (t1[None, :] * S + t2[:, None] < L).astype(np.float32)  # (S, Rc)
    f32 = np.float32

    # --- packed middle-stage factors -------------------------------------
    # The Q = S/2 + 1 spectrum rows make the middle matmuls M- (fwd) or
    # K- (inverse) padded to the next 128 tile, wasting ~half the MXU time.
    # Packing real/imag into stacked row blocks of Q2 = S/2 rows each gives
    # exact 2^k tiles:  [Xr; Xi] = DsP (S, 2S) @ [Br; Bi]  and
    # [Zr; Zi] = EsP (2S, S) @ [Yr; Yi] + AltP (2S, 8) @ Ynyq, with the
    # Nyquist row (ks = S/2) handled by the rank-1 Alt matmuls: its DFT and
    # iDFT factors are exactly (-1)^{t2} (real), its true bin (kr = 0) has a
    # zero imaginary part for real input, and its kr > 0 aliases are killed
    # by the c-scale mask folded into the kernel spectrum — so dropping its
    # imag chain is exact, not an approximation.
    Q2 = S // 2
    Dsr2, Dsi2 = Ds.real[:Q2], Ds.imag[:Q2]              # (Q2, S)
    DsP = np.block([[Dsr2, -Dsi2], [Dsi2, Dsr2]])        # (2*Q2, 2*S)
    Esr2, Esi2 = Es.real[:, :Q2], Es.imag[:, :Q2]        # (S, Q2)
    EsP = np.block([[Esr2, -Esi2], [Esi2, Esr2]])        # (2*S, 2*Q2)
    alt = ((-1.0) ** t2).astype(f32)                     # (S,)
    Alt8 = np.zeros((8, S), f32)
    Alt8[0] = alt                                        # X_nyq = Alt8 @ Br
    AltP = np.zeros((2 * S, 8), f32)
    AltP[:S, 0] = alt                                    # Zr += alt * Y_nyq
    return dict(
        Drr=Dr.real.astype(f32), Dri=Dr.imag.astype(f32),
        twr=tw.real.astype(f32), twi=tw.imag.astype(f32),
        Dsr=Ds.real.astype(f32), Dsi=Ds.imag.astype(f32),
        Esr=Es.real.astype(f32), Esi=Es.imag.astype(f32),
        twmr=twm.real.astype(f32), twmi=twm.imag.astype(f32),
        Err=Er.real.astype(f32), Eri=Er.imag.astype(f32),
        DsP=DsP.astype(f32), EsP=EsP.astype(f32), Alt8=Alt8, AltP=AltP,
        # transposed factors for the adjoint chain of the dkf kernel
        ErrT=np.ascontiguousarray(Er.real.T).astype(f32),
        EriT=np.ascontiguousarray(Er.imag.T).astype(f32),
        EsPT=np.ascontiguousarray(EsP.T).astype(f32),
        AltPT=np.ascontiguousarray(AltP.T).astype(f32),
        mask=mask)


_Q8_NAMES = ("Drr", "Dri", "DsP", "EsP", "Alt8", "AltP", "Err", "Eri")


@functools.lru_cache(maxsize=32)
def _consts_q8(lay: Layout):
    """Per-tensor symmetric int8 quantization of the DFT factor matrices
    (entries bounded by 1, so the scale is ~1/127 and the per-entry
    error ~0.4% — the same order as one bf16 rounding).  The +-1/0
    Alt/AltP matrices quantize exactly."""
    c = _consts(lay)
    q, scales = {}, {}
    for name in _Q8_NAMES:
        m = c[name]
        s = float(np.max(np.abs(m))) / 127.0
        q[name] = np.round(m / s).astype(np.int8)
        scales[name] = np.float32(s)
    return q, scales


def kernel_spectrum(k_time: jnp.ndarray, lay: Layout,
                    fast=False) -> tuple:
    """Combined time kernel (H, n) (or (H, <=n), zero-extended) ->
    (kfr, kfi): each (G, Q, HB, R) f32 with the inverse-transform scale
    c_k (1/n at k in {0, n/2}, 2/n for 0<k<n/2, 0 above Nyquist) folded in.

    The multiply layout (ks, (h, kr)) matches the kernel program's spectrum
    tensor exactly, so no transposes happen at conv time.
    """
    n, R, S, HB, Q = lay.n, lay.R, lay.S, lay.HB, lay.Q
    H = k_time.shape[0]
    G = H // HB
    from . import mxu_fft
    if jax.default_backend() in ("tpu", "axon"):
        Kf = mxu_fft.rfft_mxu(k_time.astype(jnp.float32), n,
                              fast=fast or None)
    else:
        Kf = jnp.fft.rfft(k_time.astype(jnp.float32), n=n)
    # c-scale over the (ks, kr) grid, k = kr + R*ks
    kk = np.arange(R)[None, :] + R * np.arange(Q)[:, None]
    c = np.where((kk == 0) | (kk == n // 2), 1.0, 2.0) / n
    c = np.where(kk <= n // 2, c, 0.0).astype(np.float32)    # (Q, R)
    half = n // 2 + 1
    pad = Q * R - half
    Kr = jnp.pad(Kf.real.astype(jnp.float32), ((0, 0), (0, pad)))
    Ki = jnp.pad(Kf.imag.astype(jnp.float32), ((0, 0), (0, pad)))
    Kr = Kr.reshape(H, Q, R) * c
    Ki = Ki.reshape(H, Q, R) * c
    # the true Nyquist bin is real for a real kernel; kill its roundoff imag
    # (matches the reference irfft, which never sees an imag part there)
    Ki = Ki.at[:, Q - 1, 0].set(0.0)
    Kr = Kr.reshape(G, HB, Q, R).transpose(0, 2, 1, 3)
    Ki = Ki.reshape(G, HB, Q, R).transpose(0, 2, 1, 3)
    return Kr, Ki


def conv2_ref(xc: jnp.ndarray, kfr: jnp.ndarray, kfi: jnp.ndarray,
              lay: Layout, fast: bool = False) -> jnp.ndarray:
    """Pure-XLA reference of the exact kernel math (tests, CPU fallback,
    and the route for kernel-spectrum gradients in the custom VJP).
    ``fast`` drops the einsums to default (bf16 MXU) precision — used by
    the training backward's dkf route when the fast path is on.

    xc: (B, S, H, Rc) channel-inner compact layout.
    """
    c = _consts(lay)
    S, R, Rc, HB, Q = lay.S, lay.R, lay.Rc, lay.HB, lay.Q
    B, _, H, _ = xc.shape
    x = xc.astype(jnp.float32) * c["mask"][None, :, None, :]
    kw = dict(precision=(jax.lax.Precision.DEFAULT if fast
                         else jax.lax.Precision.HIGHEST),
              preferred_element_type=jnp.float32)
    Ar = jnp.einsum("bshr,rk->bshk", x, c["Drr"], **kw)
    Ai = jnp.einsum("bshr,rk->bshk", x, c["Dri"], **kw)
    twr = c["twr"][None, :, None, :]
    twi = c["twi"][None, :, None, :]
    Br = Ar * twr - Ai * twi
    Bi = Ar * twi + Ai * twr
    Xr = jnp.einsum("qs,bshk->bqhk", c["Dsr"], Br, **kw) \
        - jnp.einsum("qs,bshk->bqhk", c["Dsi"], Bi, **kw)
    Xi = jnp.einsum("qs,bshk->bqhk", c["Dsr"], Bi, **kw) \
        + jnp.einsum("qs,bshk->bqhk", c["Dsi"], Br, **kw)
    # kernel multiply in (ks, h, kr); spectra arrive (G, Q, HB, R)
    Kr = jnp.swapaxes(kfr, 0, 1).reshape(Q, H, R)
    Ki = jnp.swapaxes(kfi, 0, 1).reshape(Q, H, R)
    Yr = Xr * Kr - Xi * Ki
    Yi = Xr * Ki + Xi * Kr
    Zr = jnp.einsum("sq,bqhk->bshk", c["Esr"], Yr, **kw) \
        - jnp.einsum("sq,bqhk->bshk", c["Esi"], Yi, **kw)
    Zi = jnp.einsum("sq,bqhk->bshk", c["Esr"], Yi, **kw) \
        + jnp.einsum("sq,bqhk->bshk", c["Esi"], Yr, **kw)
    tmr = c["twmr"][None, :, None, :]
    tmi = c["twmi"][None, :, None, :]
    Tr = Zr * tmr - Zi * tmi
    Ti = Zr * tmi + Zi * tmr
    y = jnp.einsum("bshk,kr->bshr", Tr, c["Err"], **kw) \
        - jnp.einsum("bshk,kr->bshr", Ti, c["Eri"], **kw)
    return (y * c["mask"][None, :, None, :]).astype(xc.dtype)


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7): Pallas on
    TPU cannot lower the erf primitive, and 1.5e-7 is far below the bf16
    noise floor of the fast path."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


# Weighted least-squares fit of gelu(x) - x/2 (an even function) as a
# degree-7 polynomial in x^2 on [-4, 4]; |err| < 1.3e-3 everywhere with
# the tails clamped (gelu(x>4) ~ x, |gelu(x<-4)| < 1.4e-4).  ~12 VPU ops
# vs ~25 for the exp-based erf — the exact-erf GELU was a measured ~20%
# of the whole sampling step (scripts/step_ablation.py).
_GELU_C = (3.98530402e-01, -6.54241398e-02, 9.14217304e-03,
           -8.87377753e-04, 5.52706534e-05, -1.95562042e-06,
           2.95654090e-08)


def _gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial GELU for the fast (bf16-class) path; |err| < 1.3e-3."""
    xc = jnp.clip(x, -4.0, 4.0)
    x2 = xc * xc
    p = jnp.asarray(_GELU_C[-1], x.dtype)
    for c in _GELU_C[-2::-1]:
        p = p * x2 + jnp.asarray(c, x.dtype)
    y = 0.5 * xc + x2 * p
    return jnp.where(x > 4.0, x, y)


def _kernel(u_ref, kfr_ref, kfi_ref, d_ref, *rest,
            lay: Layout, fast: bool, post: str, pre: bool = False,
            qscale=None):
    """One (channel-group, batch) program; see module docstring for the
    stage algebra.  post: 'none' | 'gelu_d' (fused D-skip + erf GELU).
    pre=True adds a channel-LayerNorm + per-channel-bias prologue
    (scale a, shift c per position, bias per channel) so norm1 + the
    diffusion-step bias of the DiffWave block cost zero extra HBM passes.

    qscale != None switches the four matmul stages to int8 MXU: the
    factor-matrix refs arrive pre-quantized (``_consts_q8``) with their
    static per-tensor scales in ``qscale``, and each stage input gets a
    fresh dynamic symmetric scale (max|t|/127) before an
    int8 x int8 -> int32 dot.  Twiddles/kernel-multiply/epilogue stay on
    the bf16 VPU path.

    Every inter-stage view is a reshape of sublane-side dims (free); the
    only VPU work is twiddles, the kernel multiply, masking, the
    optional pro/epilogue, and (int8 mode) the per-stage quantizes.
    """
    if pre:
        a_ref, c_ref, bias_ref = rest[:3]
        rest = rest[3:]
    (drr, dri, twr, twi, dsp, esp, alt8, altp, twmr, twmi, err, eri,
     mask_ref, out_ref) = rest
    S, R, Rc, HB, Q = lay.S, lay.R, lay.Rc, lay.HB, lay.Q
    f32 = jnp.float32
    tmp = jnp.bfloat16 if (fast and lay.bf16) else f32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)

    def mm(a, b):
        # the whole inter-stage chain runs in `tmp` (bf16 on the fast
        # path): Mosaic requires a 32-bit matmul accumulator, so outputs
        # round to bf16 right after the dot; keeping the twiddle/multiply
        # tensors bf16 halves the VPU work that is ~half of this kernel's
        # time (scripts/step_ablation.py)
        o = jnp.dot(a.astype(tmp), b.astype(tmp),
                    preferred_element_type=f32, precision=prec)
        return o.astype(tmp)

    def q8(t):
        """Dynamic symmetric per-tensor int8 quantization of a stage
        input; the zero-guard keeps an all-zero tile finite."""
        t32 = t.astype(f32)
        s = jnp.maximum(jnp.max(jnp.abs(t32)),
                        np.float32(1e-20)) * np.float32(1.0 / 127.0)
        return jnp.round(t32 * (np.float32(1.0) / s)).astype(jnp.int8), s

    def mm8(qa, b, scale):
        o = jnp.dot(qa, b, preferred_element_type=jnp.int32)
        return (o.astype(f32) * scale).astype(tmp)

    mask = mask_ref[:, :].astype(tmp)                     # (S, Rc)
    Q2 = S // 2
    if HB == 1:
        Kfull = kfr_ref[0, :, 0].astype(tmp)              # (Q, R)
        Ki = kfi_ref[0, :, 0][:Q2].astype(tmp)
    else:
        Kfull = kfr_ref[0].reshape(Q, HB * R).astype(tmp)
        Ki = kfi_ref[0].reshape(Q, HB * R)[:Q2].astype(tmp)
    Kr = Kfull[:Q2]                                       # regular rows
    Kn = Kfull[Q2:]                                       # (1, N) Nyquist
    # HB == 1 keeps the whole chain 2-D ((S, R) tensors): a sub-tile
    # channel dim in the middle of 3-D temporaries gets sublane-padded
    # 8x by Mosaic (choose_layout never picks 1 < HB < 8)
    if HB == 1:
        tr = twr[:, :].astype(tmp)
        ti = twi[:, :].astype(tmp)
        tmr = twmr[:, :].astype(tmp)
        tmi = twmi[:, :].astype(tmp)
    else:
        tr = twr[:, :][:, None, :].astype(tmp)
        ti = twi[:, :][:, None, :].astype(tmp)
        tmr = twmr[:, :][:, None, :].astype(tmp)
        tmi = twmi[:, :][:, None, :].astype(tmp)

    def chan3(t):
        """(S, HB, R) view of an (S*HB, R) tensor (no-op at HB=1)."""
        return t if HB == 1 else t.reshape(S, HB, R)

    # lay.BB > 1 unrolls independent per-batch-item chains so the
    # scheduler can overlap one chain's VPU stages with another's MXU time
    for bb in range(lay.BB):
        if HB == 1:
            x = u_ref[bb, :, 0, 0].astype(f32)            # (S, Rc)
            if pre:
                x = x * a_ref[bb] + c_ref[bb] + bias_ref[bb, 0]
            x = x.astype(tmp) * mask
            xm = x
        else:
            x = u_ref[bb, :, 0].astype(f32)               # (S, HB, Rc)
            if pre:
                x = (x * a_ref[bb][:, None, :] + c_ref[bb][:, None, :]
                     + bias_ref[bb, 0][None, :, :])
            x = x.astype(tmp) * mask[:, None, :]
            xm = x.reshape(S * HB, Rc)

        # S1: contract t1 lanes
        if qscale is None:
            Ar = chan3(mm(xm, drr[:, :]))
            Ai = chan3(mm(xm, dri[:, :]))
        else:
            qx, sx = q8(xm)                 # one quantize feeds both dots
            Ar = chan3(mm8(qx, drr[:, :], sx * qscale["Drr"]))
            Ai = chan3(mm8(qx, dri[:, :], sx * qscale["Dri"]))
        # twiddle (S, 1, R) broadcast over channels
        Br = (Ar * tr - Ai * ti).reshape(S, HB * R)
        Bi = (Ar * ti + Ai * tr).reshape(S, HB * R)

        # S2 packed: [Xr; Xi] = DsP @ [Br; Bi], one full-tile matmul
        # (see _consts: Q2-row blocks tile exactly; Nyquist via Alt8)
        BrBi = jnp.concatenate([Br, Bi], axis=0)          # (2S, N)
        if qscale is None:
            Xp = mm(dsp[:, :], BrBi)                      # (2*Q2, N)
            Xnyq = mm(alt8[:, :], Br)                     # (8, N), row 0
        else:
            qB, sB = q8(BrBi)               # rows [:S] are quantized Br
            Xp = mm8(dsp[:, :], qB, sB * qscale["DsP"])
            Xnyq = mm8(alt8[:, :], qB[:S], sB * qscale["Alt8"])

        # kernel multiply (c-scale folded into kf at build time)
        Xr, Xi = Xp[:Q2], Xp[Q2:]
        Yp = jnp.concatenate([Xr * Kr - Xi * Ki,
                              Xr * Ki + Xi * Kr], axis=0)  # (S, N)
        Ynyq = Xnyq * Kn                                  # (8, N), row 0

        # iA packed: [Zr; Zi] = EsP @ Yp + AltP @ Ynyq
        if qscale is None:
            Zp = mm(esp[:, :], Yp) + mm(altp[:, :], Ynyq)  # (2S, N)
        else:
            qY, sY = q8(Yp)
            qYn, sYn = q8(Ynyq)
            Zp = (mm8(esp[:, :], qY, sY * qscale["EsP"])
                  + mm8(altp[:, :], qYn, sYn * qscale["AltP"]))
        Zr = chan3(Zp[:S])
        Zi = chan3(Zp[S:])
        Tr = (Zr * tmr - Zi * tmi).reshape(S * HB, R)
        Ti = (Zr * tmi + Zi * tmr).reshape(S * HB, R)

        # iB: contract kr lanes, Re part, emit only t1 < Rc
        if qscale is None:
            y = mm(Tr, err[:, :]) - mm(Ti, eri[:, :])     # (S*HB, Rc)
        else:
            qTr, sTr = q8(Tr)
            qTi, sTi = q8(Ti)
            y = (mm8(qTr, err[:, :], sTr * qscale["Err"])
                 - mm8(qTi, eri[:, :], sTi * qscale["Eri"]))
        if HB == 1:
            if post == "gelu_d":
                y = y + d_ref[0] * x                      # + D * u skip
                y = _gelu_fast(y) if fast else _gelu_exact(y)
            out_ref[bb, :, 0, 0] = (y * mask).astype(out_ref.dtype)
            continue
        y = y.reshape(S, HB, Rc)

        if post == "gelu_d":
            y = y + d_ref[0][None, :, :] * x              # + D * u skip
            y = _gelu_fast(y) if fast else _gelu_exact(y)
        out_ref[bb, :, 0] = (y * mask[:, None, :]).astype(out_ref.dtype)


def _conv2_impl(u: jnp.ndarray, kfr: jnp.ndarray, kfi: jnp.ndarray,
                d: Optional[jnp.ndarray],
                lay: Layout, fast: bool, post: str,
                out_dtype=None, prologue=None,
                int8: bool = False) -> jnp.ndarray:
    """u: (B, S, H, Rc); kf*: (G, Q, HB, R); d: (G, HB, 1) or None.
    prologue: optional (a, c, bias) with a, c (B, S, Rc) f32 position
    scale/shift and bias (B, H) f32 per-channel add (see _kernel pre).
    int8: run the DFT matmul stages on the int8 MXU (see _kernel qscale)."""
    S, R, Rc, HB, Q = lay.S, lay.R, lay.Rc, lay.HB, lay.Q
    B, _, H, _ = u.shape
    assert u.shape[1] == S and u.shape[3] == Rc, (u.shape, lay)
    if B % lay.BB != 0:
        # batch doesn't divide the interleave factor (tests, odd tails):
        # run single-chain programs — spectra shapes don't depend on BB
        lay = lay._replace(BB=1)
    G = H // HB
    out_dtype = out_dtype or u.dtype
    c = _consts(lay)
    if d is None:
        d = jnp.zeros((G, HB, 1), jnp.float32)

    u5 = u.reshape(B, S, G, HB, Rc)
    const_names = ["Drr", "Dri", "twr", "twi", "DsP", "EsP", "Alt8", "AltP",
                   "twmr", "twmi", "Err", "Eri", "mask"]
    qscale = None
    if int8:
        cq, qscale = _consts_q8(lay)
        c = dict(c, **cq)
    const_arrays = [jnp.asarray(c[k]) for k in const_names]
    const_specs = [
        pl.BlockSpec(a.shape, lambda g, b: (0,) * a.ndim,
                     memory_space=pltpu.VMEM)
        for a in const_arrays]

    pre_arrays, pre_specs = [], []
    if prologue is not None:
        pa, pc, pbias = prologue
        pre_arrays = [pa.astype(jnp.float32), pc.astype(jnp.float32),
                      pbias.astype(jnp.float32).reshape(B, G, HB, 1)]
        pre_specs = [
            pl.BlockSpec((lay.BB, S, Rc), lambda g, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.BB, S, Rc), lambda g, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.BB, 1, HB, 1), lambda g, b: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    # grid (G, B/BB): batch minor, so each group's kernel spectrum stays
    # VMEM-resident across all batch programs
    BB = lay.BB
    assert B % BB == 0, (B, BB)
    flops_mm = 2 * (2 * S * Rc * R + 4 * Q * S * R
                    + 4 * S * Q * R + 2 * S * R * Rc) * HB
    out = pl.pallas_call(
        functools.partial(_kernel, lay=lay, fast=fast, post=post,
                          pre=prologue is not None, qscale=qscale),
        grid=(G, B // BB),
        in_specs=[
            pl.BlockSpec((BB, S, 1, HB, Rc), lambda g, b: (b, 0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, HB, R), lambda g, b: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, HB, R), lambda g, b: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, 1), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + pre_specs + const_specs,
        out_specs=pl.BlockSpec((BB, S, 1, HB, Rc),
                               lambda g, b: (b, 0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, G, HB, Rc), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm * G * B,
            bytes_accessed=u.size * 2 * u.dtype.itemsize + kfr.size * 8,
            transcendentals=(u.size if post == "gelu_d" else 0)),
        interpret=_interpret(),
    )(u5, kfr, kfi, d, *pre_arrays, *const_arrays)
    return out.reshape(B, S, H, Rc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fftconv2(u, kfr, kfi, lay: Layout, fast: bool = True):
    """Fused S4 convolution in compact layout (no epilogue; differentiable).

    u (B, S, H, Rc) -> y (B, S, H, Rc), where y is mask*Conv_k(mask*u): the
    circular-n convolution by the kernel whose (c-folded) spectrum is
    (kfr, kfi), with both input and output restricted to t < L.
    """
    if _interpret():
        return conv2_ref(u, kfr, kfi, lay)
    return _conv2_impl(u, kfr, kfi, None, lay, fast, "none")


def _fwd(u, kfr, kfi, lay, fast):
    return fftconv2(u, kfr, kfi, lay, fast), (u, kfr, kfi)


def _bwd(lay, fast, res, g):
    u, kfr, kfi = res
    # d/du: adjoint of mask.Conv_k.mask = mask.Conv_{k reversed}.mask,
    # i.e. the SAME op with the conjugate spectrum (k is real).
    du = fftconv2(g, kfr, -kfi, lay, fast)
    if _interpret():
        # d/dkf via the XLA reference (same math, autodiffed)
        _, vjp_k = jax.vjp(lambda a, b: conv2_ref(u, a, b, lay, fast),
                           kfr, kfi)
        dkfr, dkfi = vjp_k(g.astype(u.dtype))
    else:
        # fused spectrum-gradient kernel: batch-accumulated in VMEM
        dkfr, dkfi = fftconv2_dkf(u, g.astype(u.dtype), lay, fast)
    return du.astype(u.dtype), dkfr, dkfi


fftconv2.defvjp(_fwd, _bwd)


def _dkf_kernel(u_ref, g_ref, drr, dri, twr, twi, dsp, alt8,
                errt, erit, espt, altpt, twmr, twmi, mask_ref,
                dkr_ref, dki_ref, *, lay: Layout, fast: bool):
    """Kernel-spectrum gradient, one (group, batch) program, accumulated
    over the batch grid dimension.

    dK = sum_b X_b (*) conj-combine G_b where X = packed forward spectrum
    of the masked input and (Gr, Gi) = the ADJOINT of the inverse chain
    applied to the masked output cotangent — i.e. the forward chain with
    transposed factor matrices and conjugate twiddles.  All matrices are
    the same power-of-two tiles as the forward kernel.
    """
    S, R, Rc, HB = lay.S, lay.R, lay.Rc, lay.HB
    Q2 = S // 2
    f32 = jnp.float32
    tmp = jnp.bfloat16 if (fast and lay.bf16) else f32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)

    def mm(a, b):
        return jnp.dot(a.astype(tmp), b.astype(tmp),
                       preferred_element_type=f32, precision=prec)

    mask = mask_ref[:, :]
    # HB == 1: all-2-D chain (see _kernel — sub-tile middle dims padded)
    if HB == 1:
        tr, ti = twr[:, :], twi[:, :]
        tmr, tmi = twmr[:, :], twmi[:, :]
        x = u_ref[0, :, 0, 0].astype(f32) * mask
        xm = x
        gm = g_ref[0, :, 0, 0].astype(f32) * mask
    else:
        tr = twr[:, :][:, None, :]
        ti = twi[:, :][:, None, :]
        tmr = twmr[:, :][:, None, :]
        tmi = twmi[:, :][:, None, :]
        x = u_ref[0, :, 0].astype(f32) * mask[:, None, :]
        xm = x.reshape(S * HB, Rc)
        gm = (g_ref[0, :, 0].astype(f32) * mask[:, None, :]).reshape(
            S * HB, Rc)

    def chan3(t):
        return t if HB == 1 else t.reshape(S, HB, R)

    # forward spectrum of u (same stages as _kernel)
    Ar = chan3(mm(xm, drr[:, :]))
    Ai = chan3(mm(xm, dri[:, :]))
    Br = (Ar * tr - Ai * ti).reshape(S, HB * R)
    Bi = (Ar * ti + Ai * tr).reshape(S, HB * R)
    Xp = mm(dsp[:, :], jnp.concatenate([Br, Bi], axis=0))   # (S, N)
    Xnyq = mm(alt8[:, :], Br)                               # (8, N)
    Xr, Xi = Xp[:Q2], Xp[Q2:]

    # adjoint of the inverse chain applied to g
    dTr = chan3(mm(gm, errt[:, :]))                         # g @ Err^T
    dTi = chan3(-mm(gm, erit[:, :]))
    dZr = (dTr * tmr + dTi * tmi).reshape(S, HB * R)
    dZi = (-dTr * tmi + dTi * tmr).reshape(S, HB * R)
    dZp = jnp.concatenate([dZr, dZi], axis=0)               # (2S, N)
    dYp = mm(espt[:, :], dZp)                               # (S, N)
    dYnyq = mm(altpt[:, :], dZp)                            # (8, N)
    Gr, Gi = dYp[:Q2], dYp[Q2:]

    dKr = Xr * Gr + Xi * Gi                                 # (Q2, N)
    dKi = Xr * Gi - Xi * Gr
    dKn = (Xnyq * dYnyq)[:1]                                # (1, N)
    dKrQ = jnp.concatenate([dKr, dKn], axis=0)              # (Q, N)
    dKiQ = jnp.concatenate([dKi, jnp.zeros_like(dKn)], axis=0)
    if HB != 1:
        dKrQ = dKrQ.reshape(lay.Q, HB, R)
        dKiQ = dKiQ.reshape(lay.Q, HB, R)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        if HB == 1:
            dkr_ref[0, :, 0] = dKrQ
            dki_ref[0, :, 0] = dKiQ
        else:
            dkr_ref[0] = dKrQ
            dki_ref[0] = dKiQ

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        if HB == 1:
            dkr_ref[0, :, 0] += dKrQ
            dki_ref[0, :, 0] += dKiQ
        else:
            dkr_ref[0] += dKrQ
            dki_ref[0] += dKiQ


def fftconv2_dkf(u: jnp.ndarray, g: jnp.ndarray, lay: Layout,
                 fast: bool = True):
    """Fused kernel-spectrum gradient: (u, output cotangent g) ->
    (dkfr, dkfi), each (G, Q, HB, R) f32, summed over batch in-kernel
    (no (B, Q, H, R) spectra ever hit HBM — the XLA vjp route
    materializes every transform intermediate).

    Dead components — the kr > 0 alias lanes of the Nyquist row and the
    whole Nyquist imaginary row — carry unspecified values: every
    consumer reaches this through :func:`kernel_spectrum`, whose c-scale
    fold (c = 0 above Nyquist, forced-zero Nyquist imag) kills their
    cotangents exactly."""
    S, R, Rc, HB, Q = lay.S, lay.R, lay.Rc, lay.HB, lay.Q
    B, _, H, _ = u.shape
    G = H // HB
    c = _consts(lay)
    const_names = ["Drr", "Dri", "twr", "twi", "DsP", "Alt8",
                   "ErrT", "EriT", "EsPT", "AltPT", "twmr", "twmi", "mask"]
    const_arrays = [jnp.asarray(c[k]) for k in const_names]
    const_specs = [
        pl.BlockSpec(a.shape, lambda gg, b: (0,) * a.ndim,
                     memory_space=pltpu.VMEM)
        for a in const_arrays]
    u5 = u.reshape(B, S, G, HB, Rc)
    g5 = g.reshape(B, S, G, HB, Rc)
    io_spec = pl.BlockSpec((1, S, 1, HB, Rc), lambda gg, b: (b, 0, gg, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Q, HB, R), lambda gg, b: (gg, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    dkr, dki = pl.pallas_call(
        functools.partial(_dkf_kernel, lay=lay, fast=fast),
        grid=(G, B),
        in_specs=[io_spec, io_spec] + const_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((G, Q, HB, R), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * S * Rc * R + 4 * S * S * R) * HB * G * B,
            bytes_accessed=2 * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(u5, g5, *const_arrays)
    return dkr, dki


def fftconv2_gelu_d(u, kfr, kfi, d, lay: Layout, fast: bool = True,
                    int8: Optional[bool] = None):
    """Sampling fast path: conv + D*u skip + exact GELU fused in-kernel.

    GELU uses the A&S 7.1.26 erf (|err| < 1.5e-7: the TPU Pallas lowering
    has no erf primitive).  Not differentiable (no VJP) — the training path
    uses :func:`fftconv2` with the epilogue in XLA.
    ``int8`` None defers to the module :data:`INT8` toggle.
    """
    if int8 is None:
        int8 = INT8["enabled"]
    if _interpret():
        y = conv2_ref(u, kfr, kfi, lay)
        c = _consts(lay)
        m = c["mask"][None, :, None, :]
        y = y + d.reshape(1, 1, -1, 1) * (u * m).astype(y.dtype)
        return (jax.nn.gelu(y.astype(jnp.float32), approximate=False)
                * m).astype(u.dtype)
    return _conv2_impl(u, kfr, kfi, d.reshape(d.shape[0] // lay.HB,
                                              lay.HB, 1),
                       lay, fast, "gelu_d", int8=int8)


def fftconv2_ln_bias_gelu_d(u, a, c, bias, kfr, kfi, d, lay: Layout,
                            fast: bool = True,
                            int8: Optional[bool] = None):
    """Sampling fast path with the DiffWave block HEAD folded in too:
    channel LayerNorm (as position scale/shift a, c — stats are a cheap
    XLA reduction) + diffusion-step bias + conv + D*u + exact GELU, one
    HBM read and write (reference models/sashimi.py:111-116 head +
    models/s4.py:1403-1427 conv path).  Eval-only (no VJP).

    u: (B, S, H, Rc) RAW block input; a, c: (B, S, Rc) f32; bias: (B, H).
    ``int8`` None defers to the module :data:`INT8` toggle.
    """
    if int8 is None:
        int8 = INT8["enabled"]
    if _interpret():
        m = _consts(lay)["mask"][None, :, None, :]
        xn = (u.astype(jnp.float32) * a[:, :, None, :].astype(jnp.float32)
              + c[:, :, None, :].astype(jnp.float32)
              + bias[:, None, :, None].astype(jnp.float32))
        y = conv2_ref(xn, kfr, kfi, lay)
        y = y + d.reshape(1, 1, -1, 1) * (xn * m)
        return (jax.nn.gelu(y.astype(jnp.float32), approximate=False)
                * m).astype(u.dtype)
    return _conv2_impl(u, kfr, kfi, d.reshape(d.shape[0] // lay.HB,
                                              lay.HB, 1),
                       lay, fast, "gelu_d", prologue=(a, c, bias),
                       int8=int8)
