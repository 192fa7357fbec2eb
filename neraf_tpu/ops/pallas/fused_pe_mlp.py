"""Fused fourier-PE + MLP Pallas kernel (the tcnn "fully-fused MLP" on TPU).

Why: the joint train step's largest bucket after the round-5 relayout fixes
is the vision ray path — ~16-20 of 38 ms (docs/profiles/profile_r5c trace).
The proposal fields evaluate 4096x(256+96) samples and the main field
4096x48 samples per step through PE -> small-MLP chains; under XLA every
layer materializes a [1M, 128]-shaped activation in HBM (268 MB at bf16)
for the forward AND reloads it for the backward, so the whole path runs
~4x off the HBM roofline. The reference gets the same fusion from
tinycudann's fully-fused CUDA MLPs (SURVEY §2.3: NeRAF_model.py:164-167,
Nerfacto's field MLPs); this is the TPU-native equivalent.

Design (per docs in /opt/skills/guides/pallas_guide.md):
- Feature-major layout: tensors travel as (features, rows) so the tiny
  feature dim (3, 18, 128, 256) sits in sublanes and rows fill the lanes —
  a (rows, 3) f32 array would pad 3 lanes to 128 and waste 42x the DMA.
- Concat-free PE: nerf_encoding's [sin(ang), cos(ang), x] concat is
  algebraically split into three matmuls against row-blocks of the first
  layer's weight (h1 = V_s sin(ang) + V_c cos(ang) + V_x x + b). The
  Mosaic backend on this image crashes on lane-axis concats
  (ops/pallas/gl_crash_repro.py), and the split is faster anyway: the
  angle matrix ang = A x is itself one (DF,3)x(3,T) matmul.
- One grid pass over row tiles; all weights + the k^2-sized gradient
  accumulators stay VMEM-resident across the (sequential) grid; the only
  HBM traffic is x, the output, and the cotangents — never an activation.
- Backward recomputes the forward per tile (FLOPs are free here — the
  step is bandwidth-bound) and accumulates dW in f32 VMEM scratch-outputs
  with a constant index_map, exactly like stem_wgrad_kernel.py.

Numerics: matmuls run in `compute_dtype` (bf16 in production, matching the
flax Dense path) with f32 accumulation (preferred_element_type); sin/cos
and ReLU masks stay f32 (phase precision — docs/STEP_PROFILE.md). Parity
vs the XLA path is pinned in tests/test_fused_pe_mlp.py.

Dispatch: fields call this only when `pe_mlp_available()` confirms the
backend compiles it (AOT probe, same pattern as griffin_lim_kernel.py);
non-TPU backends and meshed (GSPMD-sharded) runs use the XLA path.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEF_BLOCK = 2048


def _freqs(num_frequencies: float, min_exp: float, max_exp: float):
    import numpy as np

    return 2.0 ** np.linspace(min_exp, max_exp, num_frequencies)


def _angle_matrix(num_frequencies: int, min_exp: float, max_exp: float,
                  d: int = 3):
    """A (d*F, d) with t = A @ x, t[i*F+f] = freqs[f]*x[i] (turns, not rad).

    Row order matches ops/encodings.nerf_encoding's (D, F) reshape. The
    kernel range-reduces t to [-0.5, 0.5] turns BEFORE the 2*pi scale:
    Mosaic's sin maps to the hardware approximation with NO argument
    reduction, so sin(2*pi*2^8*x) straight up returns garbage (measured
    err ~= scale); sin(2*pi*(t - round(t))) keeps every angle in
    [-pi, pi] where the primitive is accurate. x is in [0,1] upstream so
    t <= 2^8 and the f32 frac costs ~2^-18 turns of phase — the same
    order as XLA's own reduction at these magnitudes.
    """
    import numpy as np

    f = _freqs(num_frequencies, min_exp, max_exp)
    a = np.zeros((d * len(f), d), np.float32)
    for i in range(d):
        a[i * len(f):(i + 1) * len(f), i] = f
    return jnp.asarray(a)


_TWO_PI = 6.283185307179586


def _make_fwd_kernel(n_hidden: int, cdtype):
    # f32 compute must not silently degrade to Mosaic's 1-pass-bf16 dot
    mlp_prec = (jax.lax.Precision.HIGHEST if jnp.dtype(cdtype) == jnp.float32
                else jax.lax.Precision.DEFAULT)

    def kernel(x_ref, a_ref, *refs):
        # refs: v0s, v0c, v0x, b0, (vi, bi)*, vo, bo, out_ref
        v0s, v0c, v0x, b0 = refs[0], refs[1], refs[2], refs[3]
        hidden = refs[4:4 + 2 * (n_hidden - 1)]
        vo, bo, out_ref = refs[-3], refs[-2], refs[-1]

        x = x_ref[...]  # (3, T) f32
        # HIGHEST: Mosaic's default f32 dot is ONE bf16 MXU pass — a 0.4%
        # angle error at 2^8 turns randomizes sin entirely (measured)
        t = jax.lax.dot_general(
            a_ref[...], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (DF, T) turns
        ang = (t - jnp.round(t)) * _TWO_PI  # [-pi, pi]
        s = jnp.sin(ang).astype(cdtype)
        c = jnp.cos(ang).astype(cdtype)
        h = (jax.lax.dot_general(v0s[...], s, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                precision=mlp_prec)
             + jax.lax.dot_general(v0c[...], c, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                precision=mlp_prec)
             + jax.lax.dot_general(v0x[...], x.astype(cdtype),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                precision=mlp_prec)
             + b0[...])
        h = jnp.maximum(h, 0.0).astype(cdtype)
        for i in range(n_hidden - 1):
            vi, bi = hidden[2 * i], hidden[2 * i + 1]
            h = jax.lax.dot_general(vi[...], h, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                precision=mlp_prec) + bi[...]
            h = jnp.maximum(h, 0.0).astype(cdtype)
        out_ref[...] = (
            jax.lax.dot_general(vo[...], h, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                precision=mlp_prec)
            + bo[...])

    return kernel


def _make_bwd_kernel(n_hidden: int, cdtype):
    mlp_prec = (jax.lax.Precision.HIGHEST if jnp.dtype(cdtype) == jnp.float32
                else jax.lax.Precision.DEFAULT)

    def kernel(x_ref, g_ref, a_ref, *refs):
        v0s, v0c, v0x, b0 = refs[0], refs[1], refs[2], refs[3]
        hidden = refs[4:4 + 2 * (n_hidden - 1)]
        vo = refs[4 + 2 * (n_hidden - 1)]
        # outputs follow the inputs:
        outs = refs[5 + 2 * (n_hidden - 1):]
        (dx_ref, dv0s_ref, dv0c_ref, dv0x_ref, db0_ref) = outs[:5]
        dhidden = outs[5:5 + 2 * (n_hidden - 1)]
        dvo_ref, dbo_ref = outs[-2], outs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in (dv0s_ref, dv0c_ref, dv0x_ref, db0_ref, dvo_ref,
                      dbo_ref, *dhidden):
                r[...] = jnp.zeros_like(r)

        # ---- recompute forward, keeping pre-activations for relu masks
        x = x_ref[...]
        t = jax.lax.dot_general(
            a_ref[...], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        ang = (t - jnp.round(t)) * _TWO_PI  # [-pi, pi], see _angle_matrix
        s = jnp.sin(ang)
        c = jnp.cos(ang)
        sd, cd = s.astype(cdtype), c.astype(cdtype)
        pre0 = (jax.lax.dot_general(v0s[...], sd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                precision=mlp_prec)
                + jax.lax.dot_general(v0c[...], cd, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                precision=mlp_prec)
                + jax.lax.dot_general(v0x[...], x.astype(cdtype),
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                precision=mlp_prec)
                + b0[...])
        hs = [jnp.maximum(pre0, 0.0).astype(cdtype)]
        pres = [pre0]
        for i in range(n_hidden - 1):
            vi, bi = hidden[2 * i], hidden[2 * i + 1]
            p = jax.lax.dot_general(vi[...], hs[-1], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                precision=mlp_prec) + bi[...]
            pres.append(p)
            hs.append(jnp.maximum(p, 0.0).astype(cdtype))

        # ---- backward
        g = g_ref[...].astype(cdtype)  # (O, T)
        # output layer: dVo += g h^T ; dbo += sum g
        dvo_ref[...] += jax.lax.dot_general(
            g, hs[-1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=mlp_prec)
        dbo_ref[...] += jnp.sum(g_ref[...], axis=1, keepdims=True)
        # dh = Vo^T g, masked
        dh = jax.lax.dot_general(vo[...], g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                precision=mlp_prec)
        dh = jnp.where(pres[-1] > 0.0, dh, 0.0)
        for i in range(n_hidden - 2, -1, -1):
            vi = hidden[2 * i]
            dvi_ref, dbi_ref = dhidden[2 * i], dhidden[2 * i + 1]
            dhd = dh.astype(cdtype)
            dvi_ref[...] += jax.lax.dot_general(
                dhd, hs[i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mlp_prec)
            dbi_ref[...] += jnp.sum(dh, axis=1, keepdims=True)
            dh = jax.lax.dot_general(vi[...], dhd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                precision=mlp_prec)
            dh = jnp.where(pres[i] > 0.0, dh, 0.0)

        dhd = dh.astype(cdtype)
        dv0s_ref[...] += jax.lax.dot_general(
            dhd, sd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=mlp_prec)
        dv0c_ref[...] += jax.lax.dot_general(
            dhd, cd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=mlp_prec)
        dv0x_ref[...] += jax.lax.dot_general(
            dhd, x.astype(cdtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=mlp_prec)
        db0_ref[...] += jnp.sum(dh, axis=1, keepdims=True)

        # dang = (V0s^T dh) * cos(ang) - (V0c^T dh) * sin(ang); the round()
        # in the reduction is piecewise-constant so d(ang)/dt = 2*pi
        dang = (jax.lax.dot_general(v0s[...], dhd, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                precision=mlp_prec) * c
                - jax.lax.dot_general(v0c[...], dhd, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                precision=mlp_prec) * s)
        dx_ref[...] = (
            jax.lax.dot_general(a_ref[...], dang.astype(jnp.float32),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            * _TWO_PI
            + jax.lax.dot_general(v0x[...], dhd, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=mlp_prec
                                  ).astype(jnp.float32))

    return kernel


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _prep(params, num_frequencies, cdtype):
    """Split + transpose flax-layout (in,out) weights into kernel form."""
    df = 3 * num_frequencies
    (w0, b0) = params[0]
    v0s = w0[:df].T.astype(cdtype)          # (H, DF)
    v0c = w0[df:2 * df].T.astype(cdtype)    # (H, DF)
    v0x = w0[2 * df:].T.astype(cdtype)      # (H, 3)
    flat = [v0s, v0c, v0x, b0.astype(jnp.float32)[:, None]]
    for (w, b) in params[1:-1]:
        flat += [w.T.astype(cdtype), b.astype(jnp.float32)[:, None]]
    (wo, bo) = params[-1]
    flat += [wo.T.astype(cdtype), bo.astype(jnp.float32)[:, None]]
    return flat


def _fwd_call(x, params, num_frequencies, min_exp, max_exp, cdtype, block,
              interpret):
    n, d = x.shape
    assert d == 3
    n_hidden = len(params) - 1
    out_dim = params[-1][0].shape[1]
    np_rows = -(-n // block) * block
    xt = jnp.pad(x, ((0, np_rows - n), (0, 0))).T.astype(jnp.float32)
    a = _angle_matrix(num_frequencies, min_exp, max_exp)
    flat = _prep(params, num_frequencies, cdtype)

    in_specs = [
        pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        _const_spec(a.shape),
    ] + [_const_spec(f.shape) for f in flat]

    out = pl.pallas_call(
        _make_fwd_kernel(n_hidden, cdtype),
        out_shape=jax.ShapeDtypeStruct((out_dim, np_rows), jnp.float32),
        grid=(np_rows // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_dim, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, a, *flat)
    return out[:, :n].T  # (N, O) f32


def _bwd_call(x, params, g, num_frequencies, min_exp, max_exp, cdtype, block,
              interpret):
    n, _ = x.shape
    n_hidden = len(params) - 1
    df = 3 * num_frequencies
    hdims = [w.shape[1] for (w, _) in params[:-1]]
    out_dim = params[-1][0].shape[1]
    np_rows = -(-n // block) * block
    xt = jnp.pad(x, ((0, np_rows - n), (0, 0))).T.astype(jnp.float32)
    gt = jnp.pad(g, ((0, np_rows - n), (0, 0))).T.astype(jnp.float32)
    a = _angle_matrix(num_frequencies, min_exp, max_exp)
    flat = _prep(params, num_frequencies, cdtype)
    # kernel inputs: everything except bo (the output bias has no role in
    # the backward — dbo is just a sum over g)
    kernel_ins = [flat[0], flat[1], flat[2], flat[3]]
    for i in range(n_hidden - 1):
        kernel_ins += [flat[4 + 2 * i], flat[5 + 2 * i]]
    kernel_ins.append(flat[-2])  # vo

    h0 = hdims[0]
    out_shapes = [
        jax.ShapeDtypeStruct((3, np_rows), jnp.float32),       # dx
        jax.ShapeDtypeStruct((h0, df), jnp.float32),           # dv0s
        jax.ShapeDtypeStruct((h0, df), jnp.float32),           # dv0c
        jax.ShapeDtypeStruct((h0, 3), jnp.float32),            # dv0x
        jax.ShapeDtypeStruct((h0, 1), jnp.float32),            # db0
    ]
    for i in range(n_hidden - 1):
        out_shapes += [
            jax.ShapeDtypeStruct((hdims[i + 1], hdims[i]), jnp.float32),
            jax.ShapeDtypeStruct((hdims[i + 1], 1), jnp.float32),
        ]
    out_shapes += [
        jax.ShapeDtypeStruct((out_dim, hdims[-1]), jnp.float32),  # dvo
        jax.ShapeDtypeStruct((out_dim, 1), jnp.float32),          # dbo
    ]

    in_specs = [
        pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((out_dim, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        _const_spec(a.shape),
    ] + [_const_spec(f.shape) for f in kernel_ins]
    out_specs = [pl.BlockSpec((3, block), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_specs += [_const_spec(s.shape) for s in out_shapes[1:]]

    outs = pl.pallas_call(
        _make_bwd_kernel(n_hidden, cdtype),
        out_shape=out_shapes,
        grid=(np_rows // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, gt, a, *kernel_ins)

    dx = outs[0][:, :n].T
    dv0s, dv0c, dv0x, db0 = outs[1:5]
    dw0 = jnp.concatenate([dv0s.T, dv0c.T, dv0x.T], axis=0)
    dparams = [(dw0, db0[:, 0])]
    for i in range(n_hidden - 1):
        dvi, dbi = outs[5 + 2 * i], outs[6 + 2 * i]
        dparams.append((dvi.T, dbi[:, 0]))
    dvo, dbo = outs[-2], outs[-1]
    dparams.append((dvo.T, dbo[:, 0]))
    # cast grads to the param dtypes (params are stored f32)
    dparams = [(dw.astype(w.dtype), db.astype(b.dtype))
               for (dw, db), (w, b) in zip(dparams, params)]
    return dx.astype(x.dtype), dparams


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def pe_mlp(x, params, num_frequencies=6, min_exp=0.0, max_exp=8.0,
           compute_dtype=jnp.bfloat16, block=_DEF_BLOCK, interpret=False):
    """Fused nerf_encoding + relu-MLP: x (N,3) -> (N, O) f32 pre-activation.

    params: [(W, b), ...] flax-layout (in, out) weights; layer 0 consumes
    the (2*3*F + 3)-dim encoding [sin, cos, x] (ops/encodings.nerf_encoding
    ordering), hidden layers are relu, the final layer is linear.
    Equivalent to the ProposalDensityField / NerfactoField fourier base MLP
    up to the final activation (trunc_exp etc. stay outside).
    """
    return _fwd_call(x, params, num_frequencies, min_exp, max_exp,
                     compute_dtype, block, interpret)


def _pe_mlp_fwd(x, params, num_frequencies, min_exp, max_exp, compute_dtype,
                block, interpret):
    out = _fwd_call(x, params, num_frequencies, min_exp, max_exp,
                    compute_dtype, block, interpret)
    return out, (x, params)


def _pe_mlp_bwd(num_frequencies, min_exp, max_exp, compute_dtype, block,
                interpret, res, g):
    x, params = res
    dx, dparams = _bwd_call(x, params, g, num_frequencies, min_exp, max_exp,
                            compute_dtype, block, interpret)
    return dx, dparams


pe_mlp.defvjp(_pe_mlp_fwd, _pe_mlp_bwd)


def _env_impl() -> str | None:
    """NERAF_PE_MLP env override: 'fused' | 'xla' (A/B switch)."""
    v = os.environ.get("NERAF_PE_MLP", "").strip().lower()
    return v if v in ("fused", "xla") else None


@lru_cache(maxsize=None)
def pe_mlp_available(n_hidden: int, hidden: int, out_dim: int,
                     num_frequencies: int, block: int,
                     dtype_name: str) -> bool:
    """AOT-probe: does the fused kernel (fwd + bwd) compile on this backend
    for this architecture? Cached; non-TPU backends always False."""
    if jax.default_backend() != "tpu":
        return False
    try:
        cdtype = jnp.dtype(dtype_name)
        df = 6 * num_frequencies + 3
        params = [(jax.ShapeDtypeStruct((df, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((hidden,), jnp.float32))]
        for _ in range(n_hidden - 1):
            params.append((jax.ShapeDtypeStruct((hidden, hidden), jnp.float32),
                           jax.ShapeDtypeStruct((hidden,), jnp.float32)))
        params.append((jax.ShapeDtypeStruct((hidden, out_dim), jnp.float32),
                       jax.ShapeDtypeStruct((out_dim,), jnp.float32)))
        x = jax.ShapeDtypeStruct((block, 3), jnp.float32)

        def loss(x, params):
            return jnp.sum(pe_mlp(x, params, num_frequencies,
                                  0.0, 8.0, cdtype, block))

        jax.jit(jax.grad(loss, argnums=(0, 1))).lower(x, params).compile()
        return True
    except Exception:
        return False


def resolve_pe_mlp_fused(config, mesh) -> bool:
    """Decide whether the fields should run the fused kernel.

    - env NERAF_PE_MLP={fused,xla} forces either way (A/B harness);
    - meshed runs stay on XLA (pallas_call is opaque to GSPMD — it would
      force replication of the ray batch instead of sharding it);
    - otherwise fused iff the AOT probe passes on this backend.
    """
    env = _env_impl()
    if env == "xla":
        return False
    if mesh is not None and env != "fused":
        return False
    if env == "fused":
        return True
    impl = getattr(config, "pe_mlp_impl", "auto")
    if impl == "xla":
        return False
    if impl == "fused":
        return True
    # auto: probe both architectures that will run (proposal + main field)
    ok_prop = pe_mlp_available(2, 128, 1, 6, _DEF_BLOCK, "bfloat16")
    ok_main = pe_mlp_available(
        getattr(config, "base_mlp_layers", 4),
        getattr(config, "base_mlp_width", 256),
        1 + getattr(config, "geo_feat_dim", 15),
        getattr(config, "num_frequencies", 10), _DEF_BLOCK, "bfloat16")
    return ok_prop and ok_main
