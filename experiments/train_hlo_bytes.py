"""Where do the train step's bytes go?  (VERDICT r3 item 2)

Compiles ONE distillation train step (reference config bs16@450,
production bn=bf16 / no-remat defaults) for the current backend, then
aggregates the optimized HLO's top-level op OUTPUT buffer sizes by
opcode and prints the largest individual ops.  Buffer stores are the
floor of HBM write traffic; reads mirror them one fusion later, so the
per-opcode ranking names the binding stream directly.

Run on the TPU chip (wedge-safe: bounded by the caller's timeout):

    timeout 500 python experiments/train_hlo_bytes.py [--remat] [--bn_f32]

Output: per-opcode store totals (GB and GB/img), the 25 largest ops,
and the all-op total to compare against the cost-analysis
``bytes accessed`` (BENCH train_gb_img).
"""

import argparse
import collections
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
    "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
    "f64": 8, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_op(line):
    """(name, shape_str, opcode) of an HLO op line, else None.

    TPU optimized HLO carries layout/tiling annotations —
    ``bf16[16,112,112,163]{3,2,1,0:T(8,128)(2,1)}`` — so the shape is
    whatever sits between ``=`` and the opcode token before ``(``."""
    if " = " not in line:
        return None
    lhs, rhs = line.split(" = ", 1)
    name = lhs.strip().removeprefix("ROOT ").strip().lstrip("%")
    if rhs.startswith("("):  # tuple shape: up to the matching paren
        depth = 0
        for i, c in enumerate(rhs):
            depth += (c == "(") - (c == ")")
            if depth == 0:
                break
        shape_str, rest = rhs[:i + 1], rhs[i + 1:]
    else:
        sp = rhs.find(" ")
        if sp < 0:
            return None
        shape_str, rest = rhs[:sp], rhs[sp:]
    m = re.match(r"\s*([\w\-]+)\(", rest)
    if not m:
        return None
    return name, shape_str, m.group(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--bn_f32", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dump", default=None,
                    help="also write the optimized HLO text here "
                         "(input for train_hlo_physical.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rtpe_tpu.models import AttentionStudentSteps
    from rtpe_tpu.train import (
        DistillConfig, DistillTrainState, make_distill_train_step)

    bs, hw = 16, 450
    student = AttentionStudentSteps(
        inplanes=80, num_heatmaps=17, ae_dims=0,
        detach_att_for_det=True, dtype=jnp.bfloat16, remat=args.remat)
    x0 = jnp.zeros((1, hw, hw, 3))
    sv = jax.jit(lambda: student.init(
        jax.random.PRNGKey(0), x0, x0, train=False))()
    dcfg = DistillConfig()
    state = DistillTrainState.create(sv, dcfg)
    step_fn = make_distill_train_step(
        student, dcfg,
        bn_dtype=None if args.bn_f32 else jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(bs, hw, hw, 3).astype(np.float32),
        "img_alt": rng.rand(bs, hw, hw, 3).astype(np.float32),
        "segm_mask": np.ones((bs, hw, hw, 1), np.float32),
        "gt_hms": np.zeros((bs, hw, hw, 17), np.float32),
        "teacher_hms": rng.rand(bs, hw, hw, 17).astype(np.float32),
        "mask": np.ones((bs, hw, hw, 1), np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    print("compiling one train step ...", file=sys.stderr, flush=True)
    compiled = jax.jit(step_fn).lower(state, batch).compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB", file=sys.stderr)
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)
        print(f"dumped to {args.dump}", file=sys.stderr)

    by_opcode = collections.Counter()
    count = collections.Counter()
    ops = []
    # only ENTRY-computation ops are buffer stores — fusion bodies are
    # separate computations whose internals live in registers/VMEM
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.rstrip() == "}":
            in_entry = False
        if not in_entry:
            continue
        got = parse_op(line)
        if not got:
            continue
        name, shape_str, opcode = got
        if opcode in ("parameter", "constant", "tuple",
                      "get-tuple-element"):
            continue
        b = shape_bytes(shape_str)
        if b == 0:
            continue
        by_opcode[opcode] += b
        count[opcode] += 1
        ops.append((b, opcode, name, shape_str.strip()))

    total = sum(by_opcode.values())
    print(f"\n== store bytes by opcode (total "
          f"{total / 1e9:.2f} GB = {total / bs / 1e9:.3f} GB/img) ==")
    for opcode, b in by_opcode.most_common(20):
        print(f"  {opcode:24s} {b / 1e9:7.3f} GB  "
              f"({b / bs / 1e6:8.1f} MB/img, n={count[opcode]})")

    ops.sort(reverse=True)
    print(f"\n== {args.top} largest ops ==")
    for b, opcode, name, shape_str in ops[:args.top]:
        print(f"  {b / 1e6:8.1f} MB  {opcode:16s} {name:40s} "
              f"{shape_str[:70]}")

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(f"\ncost analysis: flops/img "
              f"{float(ca.get('flops', 0)) / bs / 1e9:.1f} G, "
              f"bytes/img "
              f"{float(ca.get('bytes accessed', 0)) / bs / 1e9:.3f} GB")
    except Exception as e:
        print(f"cost analysis unavailable: {e}")


if __name__ == "__main__":
    main()
