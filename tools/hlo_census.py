"""Static HLO census of the compiled CFG forward (real chip).

Two tables from one compile, replacing the dead axon device-op trace
(PERF.md round 4):

1. **Copy census** (default): every pure-data-movement op (standalone
   copy/transpose, or a kLoop fusion whose ROOT is copy/transpose), ranked
   by bytes, attributed to its repo source site. Fusions are classified by
   their fused computation's ROOT op — NOT by substring-matching the call
   line (ADVICE r4: operand/computation names containing "copy" inflated
   the old census). bitcast-convert is bucketed separately and excluded
   from the priced total (same-width bitcasts are free reinterprets).

2. **Cost-model table** (``--cost``): per-source-site roofline estimate for
   EVERY top-level op — time = max(FLOPs / MXU, bytes_accessed / HBM_BW) —
   the static replacement for the round-3 device-op profile. FLOPs are
   parsed for dot/convolution; custom-calls (Pallas kernels) are priced by
   bytes only and flagged (their measured times live in the sweep tools).

Both tables share one calibrated constant set: HBM 820 GB/s, MXU 200 TF/s
bf16 (PERF.md "Measured" section).

Usage: python tools/hlo_census.py [energy] [--cost]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Calibrated constants — keep in sync with PERF.md.
HBM_GBPS = 820.0
MXU_TFS = 200.0

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred|s64|u64)\[([0-9,]*)\]")
_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1, "s64": 8, "u64": 8}
_SRC = re.compile(r'source_file="([^"]+)".*?source_line=(\d+)')
_BRACES = re.compile(r"\{[^{}]*\}")
_DEF = re.compile(r"^%?([\w.\-]+) = (?:\(?)((?:\w+\[[0-9,]*\][^ ]*(?:, )?)+)\)? (\w[\w\-]*)\(")
_COMP_HDR = re.compile(r"^%?([\w.\-]+) (?:\([^)]*\))? ?-> .* \{$|^%?([\w.\-]+) \{$")
_CALLS = re.compile(r"calls=%?([\w.\-]+)")
_OPERANDS = re.compile(r"\(([^)]*)\)")


def _shape_list_bytes(shapes: str) -> int:
    n = 0
    for m in _SHAPE.finditer(shapes):
        e = 1
        dims = m.group(2)
        for d in dims.split(",") if dims else []:
            e *= int(d)
        n += e * _BYTES[m.group(1)]
    return n


def _site_of(line: str) -> str:
    lm = _SRC.search(line)
    return (lm.group(1).split("/")[-1] + ":" + lm.group(2)) if lm else "?"


class Instr:
    __slots__ = ("name", "kind", "out_bytes", "operands", "line", "root")

    def __init__(self, name, kind, out_bytes, operands, line):
        self.name, self.kind = name, kind
        self.out_bytes, self.operands, self.line = out_bytes, operands, line
        self.root = None


def parse_module(text: str):
    """One pass over the HLO text: per-computation instruction lists, a
    global name->Instr table, and each computation's ROOT op kind."""
    comps: dict = {}
    table: dict = {}
    cur = None
    for raw in text.splitlines():
        s = raw.strip()
        if raw and not raw[0].isspace() and s.endswith("{"):
            # computation header, e.g. "%fused_computation.12 (...) -> ... {"
            name = s.split(" ", 1)[0].lstrip("%")
            cur = {"name": name, "instrs": [], "root_kind": None}
            comps[name] = cur
            continue
        if s == "}":
            cur = None
            continue
        if cur is None or " = " not in s:
            continue
        is_root = s.startswith("ROOT ")
        body = s[5:] if is_root else s
        m = re.match(r"%?([\w.\-]+) = (.*)$", body)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        # TPU HLO layouts carry tiling parens — bf16[...]{3,0,2,1:T(8,128)
        # (2,1)} — which break any "split at first paren" parsing (the bug
        # that made the first real-chip census report ZERO copies). Strip
        # every brace group first; shapes/attrs then contain no parens, so
        # the op kind is the first identifier directly before a "(".
        clean = _BRACES.sub("", rest)
        while _BRACES.search(clean):
            clean = _BRACES.sub("", clean)
        km = re.search(r"([a-z][\w\-]*)\(", clean)
        if not km:
            continue
        kind = km.group(1)
        out_bytes = _shape_list_bytes(clean[: km.start()])
        om = re.match(r"\(([^()]*)\)", clean[km.end() - 1:])
        operands = []
        if om:
            for tok in om.group(1).split(","):
                tok = tok.strip()
                tm = re.match(r"(?:\w+\[[0-9,]*\][^ ]* )?%?([\w.\-]+)$", tok)
                if tm:
                    operands.append(tm.group(1))
        ins = Instr(name, kind, out_bytes, operands, s)
        cur["instrs"].append(ins)
        table[name] = ins
        if is_root:
            cur["root_kind"] = kind
    return comps, table


_MOVE_KINDS = ("copy", "transpose", "reshape")


def copy_census(comps, table, entry_name: str):
    by_kind = collections.Counter()
    by_site = collections.Counter()
    site_n = collections.Counter()
    bitcast = 0
    rows = []
    entry = comps[entry_name]
    for ins in entry["instrs"]:
        kind = None
        if ins.kind in ("copy", "transpose"):
            kind = ins.kind
        elif ins.kind == "bitcast-convert":
            bitcast += ins.out_bytes
            continue
        elif ins.kind == "fusion":
            cm = _CALLS.search(ins.line)
            callee = comps.get(cm.group(1)) if cm else None
            if callee and callee["root_kind"] in ("copy", "transpose"):
                kind = f"fusion-{callee['root_kind']}"
        if not kind:
            continue
        byt = ins.out_bytes
        by_kind[kind] += byt
        site = _site_of(ins.line)
        by_site[site] += byt
        site_n[site] += 1
        if byt >= 4 * 1024 * 1024:
            rows.append((byt, kind, site, ins.line[:120]))
    rows.sort(reverse=True)
    for byt, kind, site, s in rows[:20]:
        print(f"{byt/1e6:8.1f} MB  {kind:16s} {site:24s} {s}")
    print("\nby source site:")
    for site, byt in by_site.most_common(25):
        print(f"{byt/1e6:9.1f} MB  x{site_n[site]:<3d} {site}")
    total = sum(by_kind.values())
    ms = 2 * total / (HBM_GBPS * 1e9) * 1e3  # r+w
    print(f"\ntotals: {dict(by_kind)}  sum={total/1e6:.1f} MB "
          f"(~{ms:.2f} ms r+w at {HBM_GBPS:.0f} GB/s; "
          f"bitcast-convert {bitcast/1e6:.1f} MB excluded)")


_DOT_CDIMS = re.compile(
    r"lhs_contracting_dims=\{([0-9,]*)\}.*?rhs_contracting_dims=\{([0-9,]*)\}"
)
_DOT_BDIMS = re.compile(r"lhs_batch_dims=\{([0-9,]*)\}")
_WINDOW = re.compile(r"window=\{size=([0-9x]+)")


def _dims_of_first_shape(s: str):
    m = _SHAPE.search(s)
    if not m:
        return None
    return [int(d) for d in m.group(2).split(",")] if m.group(2) else []


def _op_flops(ins: Instr, table) -> float:
    """FLOPs for dot/convolution parsed from shapes; fusions recurse into
    their computation elsewhere; everything else 0."""
    if ins.kind == "dot":
        # out elems * 2 * contracted extent (from the lhs operand shape)
        cm = _DOT_CDIMS.search(ins.line)
        if not cm:
            return 0.0
        lhs = table.get(ins.operands[0]) if ins.operands else None
        lhs_dims = _dims_of_first_shape(lhs.line) if lhs else None
        out_dims = _dims_of_first_shape(ins.line)
        if lhs_dims is None or out_dims is None:
            return 0.0
        k = 1
        for d in (int(x) for x in cm.group(1).split(",") if x):
            if d < len(lhs_dims):
                k *= lhs_dims[d]
        out_e = 1
        for d in out_dims:
            out_e *= d
        return 2.0 * out_e * k
    if ins.kind == "convolution":
        wm = _WINDOW.search(ins.line)
        out_dims = _dims_of_first_shape(ins.line)
        rhs = table.get(ins.operands[1]) if len(ins.operands) > 1 else None
        rhs_dims = _dims_of_first_shape(rhs.line) if rhs else None
        if out_dims is None or rhs_dims is None:
            return 0.0
        out_e = 1
        for d in out_dims:
            out_e *= d
        # kernel elems * Cin = prod(rhs dims) / Cout; Cout ~ last out dim
        rhs_e = 1
        for d in rhs_dims:
            rhs_e *= d
        cout = out_dims[-1] if out_dims else 1
        return 2.0 * out_e * (rhs_e / max(cout, 1))
    return 0.0


def cost_table(comps, table, entry_name: str):
    """Roofline estimate per source site over all top-level entry ops."""
    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # ms, GB, GF, n
    flagged = collections.Counter()
    entry = comps[entry_name]
    for ins in entry["instrs"]:
        if ins.kind in ("parameter", "constant", "get-tuple-element",
                        "tuple", "bitcast"):
            continue
        in_bytes = sum(
            table[o].out_bytes for o in ins.operands if o in table
        )
        byt = ins.out_bytes + in_bytes
        flops = _op_flops(ins, table)
        if ins.kind == "fusion":
            cm = _CALLS.search(ins.line)
            callee = comps.get(cm.group(1)) if cm else None
            if callee:
                flops = sum(_op_flops(i, table) for i in callee["instrs"])
        ms_bw = byt / (HBM_GBPS * 1e9) * 1e3
        ms_mxu = flops / (MXU_TFS * 1e12) * 1e3
        ms = max(ms_bw, ms_mxu)
        site = _site_of(ins.line)
        if ins.kind == "custom-call":
            # Every Pallas call shares the wrapper's source line (vma.py),
            # and the Mosaic op_name carries no path — attribute by output
            # shape instead, which separates the kernel families.
            sm = _SHAPE.search(ins.line)
            if sm:
                site = f"pallas {sm.group(1)}[{sm.group(2)}]"
            flagged[site] += 1  # Pallas: bytes-only floor, measured elsewhere
        a = agg[site]
        a[0] += ms
        a[1] += byt / 1e9
        a[2] += flops / 1e9
        a[3] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'site':28s} {'ms(est)':>8s} {'GB':>7s} {'GFLOP':>8s} {'n':>4s}")
    tot = 0.0
    for site, (ms, gb, gf, n) in rows[:40]:
        mark = "*" if site in flagged else " "
        print(f"{site:28s} {ms:8.2f} {gb:7.2f} {gf:8.1f} {n:4d}{mark}")
        tot += ms
    tot += sum(v[0] for k, v in rows[40:])
    print(f"\nsum of roofline floors: {tot:.1f} ms "
          f"(* = custom-call/Pallas: bytes-floor only — see sweep tools "
          f"for measured times)")


def main():
    import jax
    import jax.numpy as jnp

    from lvd_tpu.config import PRESETS
    from lvd_tpu.models import unet3d as unet_mod
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    args = [a for a in sys.argv[1:]]
    energy = "energy" in args
    cost = "--cost" in args

    preset = PRESETS["zeroscope"]
    cfg = preset.unet
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        unet_mod.init_unet3d(jax.random.PRNGKey(0), cfg),
    )
    frames = 24
    hl, wl = preset.height // 8, preset.width // 8
    b = 1 if energy else 2
    lat = jnp.zeros((b, frames, hl, wl, 4), jnp.bfloat16)
    txt = jnp.zeros((b, cfg.max_text_len, cfg.cross_attention_dim), jnp.bfloat16)

    def fwd(p, lat, txt):
        eps, _ = unet_mod.apply_unet3d(p, cfg, lat, 500, txt)
        return eps

    dump = os.environ.get("LVD_CENSUS_DUMP", "/tmp/hlo_census_dump.txt")
    if os.environ.get("LVD_CENSUS_FROM"):
        with open(os.environ["LVD_CENSUS_FROM"]) as f:
            text = f.read()
    else:
        compiled = jax.jit(fwd).lower(params, lat, txt).compile()
        texts = [m.to_string()
                 for m in compiled.runtime_executable().hlo_modules()] \
            if hasattr(compiled, "runtime_executable") else [compiled.as_text()]
        text = "\n".join(texts)
        if dump:
            with open(dump, "w") as f:
                f.write(text)
    print(f"optimized HLO: {len(text) / 1e6:.1f} MB", file=sys.stderr)

    comps, table = parse_module(text)
    entry_name = None
    for name, c in comps.items():
        if name.startswith("main") or ".main" in name or name.startswith("ENTRY"):
            entry_name = name
    if entry_name is None:
        # largest computation by instruction count
        entry_name = max(comps, key=lambda n: len(comps[n]["instrs"]))
    print(f"entry computation: {entry_name} "
          f"({len(comps[entry_name]['instrs'])} ops)", file=sys.stderr)

    if cost:
        cost_table(comps, table, entry_name)
    else:
        copy_census(comps, table, entry_name)


if __name__ == "__main__":
    main()
