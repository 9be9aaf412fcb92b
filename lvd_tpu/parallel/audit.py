"""Machine-checked collective-volume audit.

Parses the lowered StableHLO of a jitted (shard_map'd) function and sums the
bytes moved by every collective op. This is the ground truth behind the
v5e-8 scaling projection in PERF.md: instead of hand-counting all_to_alls
per layer, we lower the actual sharded forward at the real shapes and read
the collectives out of the module text.

Notes on semantics:

* Ops inside a ``lax.scan``/``while`` body appear ONCE in the module text but
  execute once per iteration — audit a single step function (e.g. one UNet
  forward), not a whole sampling loop, and multiply by the step count.
* ``resident_bytes`` is the result-tensor size. ``wire_bytes`` converts it to
  per-device ICI traffic with the standard algorithm costs:
    - all_to_all:        size * (n-1)/n   (each shard keeps 1/n locally)
    - all_reduce (ring): 2 * size * (n-1)/n
    - all_gather:        size * (n-1)/n   (size = gathered output)
    - reduce_scatter:    size * (n-1)/n   (size = scattered input)
    - collective_permute: size            (every byte crosses a link once)
"""

from __future__ import annotations

import re
from typing import Dict

_OP = re.compile(
    r'"stablehlo\.(all_to_all|all_reduce|collective_permute|all_gather|'
    r"reduce_scatter)\""
)
_RESULT = re.compile(r"->\s+(?:tensor<([^>]+)>|\(tensor<([^>]+)>)")

_DTYPE_BYTES = {
    "bf16": 2, "f16": 2, "f32": 4, "f64": 8,
    "i8": 1, "ui8": 1, "i16": 2, "ui16": 2,
    "i32": 4, "ui32": 4, "i64": 8, "ui64": 8, "i1": 1,
}


def _tensor_bytes(spec: str) -> int:
    """'2x8x16x4xbf16' -> byte size; bare 'f32' (rank-0) -> 4."""
    parts = spec.split("x")
    dtype = parts[-1]
    if dtype not in _DTYPE_BYTES:
        raise ValueError(f"unknown element type in tensor<{spec}>")
    n = 1
    for d in parts[:-1]:
        n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def audit_text(stablehlo_text: str, n_devices: int) -> Dict[str, dict]:
    """Collective census of a lowered module. Returns
    {op_kind: {count, resident_bytes, wire_bytes}} plus a "total" row."""
    out: Dict[str, dict] = {}
    total_wire = total_res = total_count = 0
    for m in _OP.finditer(stablehlo_text):
        kind = m.group(1)
        tail = stablehlo_text[m.start() : m.start() + 8000]
        res = _RESULT.search(tail)
        if res is None:  # pragma: no cover - malformed module text
            continue
        size = _tensor_bytes(res.group(1) or res.group(2))
        frac = (n_devices - 1) / n_devices
        if kind == "all_reduce":
            wire = int(2 * size * frac)
        elif kind == "collective_permute":
            wire = size
        else:  # all_to_all / all_gather / reduce_scatter
            wire = int(size * frac)
        row = out.setdefault(kind, {"count": 0, "resident_bytes": 0, "wire_bytes": 0})
        row["count"] += 1
        row["resident_bytes"] += size
        row["wire_bytes"] += wire
        total_count += 1
        total_res += size
        total_wire += wire
    out["total"] = {
        "count": total_count,
        "resident_bytes": total_res,
        "wire_bytes": total_wire,
    }
    return out


def audit_collectives(fn, *args, n_devices: int, **kwargs) -> Dict[str, dict]:
    """Lower ``jax.jit(fn)`` at the given args and audit its collectives.

    Lowering stops before XLA optimization, so this is fast even at full
    model shapes; shapes inside shard_map regions are already per-shard.
    """
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    return audit_text(lowered.as_text(), n_devices=n_devices)


def _main(argv=None):
    """Census at REAL preset shapes: lower one frame-sharded CFG UNet
    forward on an N-virtual-device CPU mesh and print the per-device ICI
    byte count. This is the machine-checked input to the v5e-8 scaling
    projection in PERF.md (lowering only — no compile, runs offline).

    Usage: python -m lvd_tpu.parallel.audit [--preset zeroscope] [--n 8]
           [--guided]  (adds the guidance energy fwd+bwd unit instead)
    """
    import argparse
    import json

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("--preset", default="zeroscope")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--frames", type=int, default=None)
    args = p.parse_args(argv)

    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.n}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..config import PRESETS
    from ..models.unet3d import apply_unet3d, init_unet3d
    from .mesh import make_mesh

    preset = PRESETS[args.preset]
    cfg = preset.unet
    f = args.frames or preset.default_num_frames
    h, w = preset.height // 8, preset.width // 8
    mesh = make_mesh(args.n, model_parallel=1)

    params = jax.eval_shape(lambda k: init_unet3d(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16)
        if jnp.issubdtype(s.dtype, jnp.floating) else jnp.zeros(s.shape, s.dtype),
        params,
    )
    latents = jnp.zeros((1, f, h, w, 4), jnp.bfloat16)
    text = jnp.zeros((2, cfg.max_text_len, cfg.cross_attention_dim), jnp.bfloat16)

    def fwd(p_, lat, txt):
        lat_in = jnp.concatenate([lat, lat], axis=0)
        eps, _ = apply_unet3d(p_, cfg, lat_in, 500, txt, spmd_axis="data")
        return eps

    sharded = shard_map(
        fwd, mesh=mesh, in_specs=(P(), P(None, "data"), P()),
        out_specs=P(None, "data"),
    )
    census = audit_collectives(sharded, params, latents, text, n_devices=args.n)
    print(json.dumps({
        "preset": args.preset, "n_devices": args.n, "frames": f,
        "latent_hw": [h, w], "unit": "one CFG UNet forward",
        "census": census,
    }))


if __name__ == "__main__":
    _main()
