"""Fused Kaldi-fbank Pallas kernel.

One kernel pass per (batch row, frame tile): dither (on-core PRNG) ->
remove-DC -> preemphasis -> povey window -> real-DFT as two MXU matmuls ->
power spectrum -> mel filterbank matmul -> log. Replaces the chain of XLA
ops in ops/fbank.fbank_jax with a single VMEM-resident pipeline (the
framing gather stays in XLA — it is a pure copy).

Native-dependency equivalence: torchaudio.compliance.kaldi.fbank
(SURVEY.md §2.3) -> this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import resolve_interpret

from .. import fbank as fbank_ops

_EPS = np.float32(1.1920928955078125e-07)


def _fbank_kernel(
    seed_ref,       # [1] SMEM  (scalar prefetch)
    frames_ref,     # [1, TILE, WS] VMEM
    window_ref,     # [1, WS] VMEM
    cos_ref,        # [WS, F] VMEM
    sin_ref,        # [WS, F] VMEM
    mel_ref,        # [F, M] VMEM
    out_ref,        # [1, TILE, M] VMEM
    *,
    dither: float,
):
    x = frames_ref[0].astype(jnp.float32)            # [TILE, WS]
    if dither != 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919 + pl.program_id(1))
        bits = pltpu.prng_random_bits(x.shape)
        # uniform (0,1] from the top 24 bits, Box-Muller to a normal
        u1 = (pltpu.bitcast(bits, jnp.uint32) >> 8).astype(jnp.float32) / (1 << 24)
        bits2 = pltpu.prng_random_bits(x.shape)
        u2 = (pltpu.bitcast(bits2, jnp.uint32) >> 8).astype(jnp.float32) / (1 << 24)
        u1 = jnp.maximum(u1, 1e-7)
        normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
        x = x + dither * normal
    # remove DC
    x = x - jnp.mean(x, axis=1, keepdims=True)
    # preemphasis 0.97 with first-sample replication
    prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    x = x - 0.97 * prev
    # povey window
    x = x * window_ref[0]
    # DFT via MXU
    re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(x, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im                          # [TILE, F]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(mel, _EPS))


@functools.partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "num_mel_bins", "frame_length", "frame_shift",
        "dither", "interpret",
    ),
)
def fbank_pallas(
    waveform: jax.Array,
    *,
    sample_rate: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    dither: float = 0.0,
    seed: jax.Array | int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """[B, N] (x 2**15) -> [B, T, M] fp32 log-mel features."""
    interpret = resolve_interpret(interpret)
    ws, shift, padded = fbank_ops.frame_params(
        sample_rate, frame_length, frame_shift
    )
    bsz, n = waveform.shape
    t = fbank_ops.num_frames(n, ws, shift)
    tile = 16
    t_padded = ((t + tile - 1) // tile) * tile

    idx = jnp.arange(ws)[None, :] + shift * jnp.arange(t)[:, None]
    frames = waveform.astype(jnp.float32)[:, idx]      # [B, T, WS]
    if t_padded != t:
        frames = jnp.pad(frames, ((0, 0), (0, t_padded - t), (0, 0)))

    window = jnp.asarray(fbank_ops.povey_window(ws), jnp.float32)[None, :]
    cos_m, sin_m = fbank_ops.dft_matrices(ws, padded)
    cos_m = jnp.asarray(cos_m, jnp.float32)
    sin_m = jnp.asarray(sin_m, jnp.float32)
    mel_t = jnp.asarray(
        fbank_ops.mel_banks(num_mel_bins, padded, sample_rate).T, jnp.float32
    )
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, t_padded // tile),
        in_specs=[
            pl.BlockSpec(
                (1, tile, ws), lambda b, i, s: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, ws), lambda b, i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ws, padded // 2), lambda b, i, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ws, padded // 2), lambda b, i, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (padded // 2, num_mel_bins),
                lambda b, i, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, num_mel_bins), lambda b, i, s: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_fbank_kernel, dither=dither),
        out_shape=jax.ShapeDtypeStruct((bsz, t_padded, num_mel_bins), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed_arr, frames, window, cos_m, sin_m, mel_t)
    return out[:, :t]
