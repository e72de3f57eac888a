"""Physical (tile-padded) HBM traffic + MXU work of one train step.

XLA's ``cost_analysis()`` counts LOGICAL bytes and flops, but TPU
buffers are tiled ``T(8,128)`` (x ``(2,1)`` packing for bf16): a
bf16[..,163] tensor physically occupies 256 lanes, a [..,40] tensor
128, so lane-unaligned channel counts (the student's 163/83/80/40/20/17)
inflate real HBM traffic and real MXU tiles well past the logical
numbers.  The train step measured 92.8% of *logical* HBM peak
(BENCH_r03 ``train_hbm_pct_peak``); this script answers whether the
step is in fact at the PHYSICAL roofline — and on which resource.

Method: parse a scheduled optimized-HLO dump (``--hlo FILE``, e.g. from
``jax.jit(step).lower(...).compile().as_text()``).  For every ENTRY op:

* writes = physical bytes of result parts NOT in scratch spaces
  (``S(1)`` = VMEM, ``S(2)`` = SMEM are free of HBM traffic);
* reads  = physical bytes of each operand whose defining op stored to
  HBM (VMEM-resident operands are free; every consumer re-reads —
  an upper bound, but fusion has already internalized most reuse);
* convolution MACs, logical and physical (Cin/Cout padded to the
  128-lane MXU tile) — a model of the systolic-array occupancy.

Traffic is attributed fwd/bwd and per source module via the op
``metadata`` (``transpose(jvp(...))`` marks backward ops).

Usage:
    python experiments/train_hlo_physical.py --hlo /tmp/train_step.hlo \
        --bs 16 --img_s 337
"""

import argparse
import collections
import re

DT = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
      "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
      "f64": 8}

# one shape with layout: dtype[dims]{perm:T(a,b)(p,q)S(n)}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]\{([^{}]*)\}")
_OPLINE_RE = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+) = (.*)$")


def _one_phys(dt, dims_s, layout):
    """(physical_bytes, logical_bytes, space) of a single shape."""
    if dt not in DT:
        return 0, 0, 0
    dims = [int(d) for d in dims_s.split(",") if d]
    n = 1
    for d in dims:
        n *= d
    logical = n * DT[dt]
    sp = 0
    m = re.search(r"S\((\d+)\)", layout)
    if m:
        sp = int(m.group(1))
    m = re.search(r"T\((\d+),(\d+)\)", layout)
    phys = logical
    if m and len(dims) >= 2:
        a, b = int(m.group(1)), int(m.group(2))
        pm = re.search(r"\)\((\d+),(\d+)\)", layout)
        pack = int(pm.group(1)) if pm else 1
        perm = [int(x) for x in layout.split(":")[0].split(",")
                if x.strip().lstrip("-").isdigit()]
        if len(perm) >= 2:
            d_minor, d_next = dims[perm[0]], dims[perm[1]]
            rest = n // max(d_minor * d_next, 1)
            pad_minor = -(-d_minor // b) * b
            pad_next = -(-d_next // (a * pack)) * (a * pack)
            phys = rest * pad_minor * pad_next * DT[dt]
    return phys, logical, sp


def shape_parts(shape_str):
    """[(phys, logical, space), ...] for every array in a shape string."""
    return [_one_phys(*t) for t in _SHAPE_RE.findall(shape_str)]


def parse_ops(txt, entry_only=True):
    """ops: name -> dict(opcode, shape_str, operands, meta).

    With entry_only, restrict to the ENTRY computation (buffer-level
    traffic); otherwise scan every computation (for convolution MACs —
    convs are hoisted into fusion bodies by the TPU backend, and each
    body is called once per step here: no while loops in this step)."""
    ops = {}
    in_entry = not entry_only
    for line in txt.splitlines():
        if entry_only:
            if line.startswith("ENTRY "):
                in_entry = True
                continue
            if in_entry and line.rstrip() == "}":
                break
            if not in_entry:
                continue
        m = _OPLINE_RE.match(line)
        if not m:
            continue
        name, rhs = m.groups()
        # shape = rhs up to the opcode token; opcode = word before '('
        if rhs.startswith("("):
            depth = 0
            for i, c in enumerate(rhs):
                depth += (c == "(") - (c == ")")
                if depth == 0:
                    break
            shape_str, rest = rhs[:i + 1], rhs[i + 1:]
        else:
            sp = rhs.find(" ")
            shape_str, rest = rhs[:sp], rhs[sp:]
        om = re.match(r"\s*([\w\-]+)\(", rest)
        if not om:
            continue
        opcode = om.group(1)
        # operand names: inside the first balanced paren group
        start = rest.find("(")
        depth, j = 0, start
        for j in range(start, len(rest)):
            depth += (rest[j] == "(") - (rest[j] == ")")
            if depth == 0:
                break
        operands = re.findall(r"%([\w.\-]+)", rest[start:j + 1])
        meta = ""
        mm = re.search(r'op_name="([^"]*)"', rest)
        if mm:
            meta = mm.group(1)
        win = ""
        wm = re.search(r"window=\{([^}]*)\}", rest)
        if wm:
            win = wm.group(1)
        dl = ""
        dm = re.search(r"dim_labels=(\S+?)[,\s]", rest)
        if dm:
            dl = dm.group(1)
        ops[name] = dict(opcode=opcode, shape=shape_str,
                         operands=operands, meta=meta, window=win,
                         dim_labels=dl)
    return ops


def module_key(meta):
    """(fwd|bwd, module) from an op_name metadata string."""
    bwd = "transpose(jvp" in meta
    m = re.search(r"jvp\(\w+\)\)?/((?:alt_)?\w+)", meta)
    mod = m.group(1) if m else (meta.split("/")[-2]
                                if meta.count("/") > 1 else "other")
    return ("bwd" if bwd else "fwd"), mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", required=True)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--img_s", type=float, default=None,
                    help="measured step rate, to convert to GB/s & TFLOP/s")
    ap.add_argument("--hbm_peak", type=float, default=819.0)
    ap.add_argument("--mxu_peak", type=float, default=197.0)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    txt = open(args.hlo).read()
    ops = parse_ops(txt, entry_only=True)
    all_ops = parse_ops(txt, entry_only=False)
    bs = args.bs

    writes = reads = 0
    w_log = r_log = 0
    by_mod_traffic = collections.Counter()
    by_opcode_w = collections.Counter()

    def hbm_result_parts(name):
        """[(phys, logical)] result parts of op `name` that live in HBM."""
        o = ops.get(name)
        if o is None:
            return []
        parts = shape_parts(o["shape"])
        opc = o["opcode"]
        if opc in ("parameter", "constant"):
            return [(p, l) for p, l, sp in parts if sp == 0]
        if opc.endswith("-done"):
            return []  # counted at -start
        if opc.endswith("-start"):
            # tuple = (aliased operands..., result, scratch); copy-start
            # leads with the destination instead.
            arrs = [(p, l, sp) for p, l, sp in parts]
            if not arrs:
                return []
            if opc == "copy-start":
                p, l, sp = arrs[0]
                return [(p, l)] if sp == 0 else []
            keep = arrs[1:] if len(arrs) > 1 else arrs
            return [(p, l) for p, l, sp in keep
                    if sp == 0 and l > 64]  # drop scalar scratch
        if opc in ("tuple", "get-tuple-element", "bitcast"):
            return []
        return [(p, l) for p, l, sp in parts if sp == 0]

    # map each name to (phys, logical) HBM footprint for reads
    hbm_foot = {}
    for name in ops:
        parts = hbm_result_parts(name)
        hbm_foot[name] = (sum(p for p, _ in parts),
                          sum(l for _, l in parts))

    # GTEs: inherit the element's own printed shape/space
    for name, o in ops.items():
        if o["opcode"] == "get-tuple-element":
            parts = shape_parts(o["shape"])
            hbm_foot[name] = (
                sum(p for p, l, sp in parts if sp == 0),
                sum(l for p, l, sp in parts if sp == 0))

    for name, o in ops.items():
        opc = o["opcode"]
        if opc in ("parameter", "constant", "tuple", "get-tuple-element",
                   "bitcast"):
            continue
        wparts = hbm_result_parts(name)
        wp = sum(p for p, _ in wparts)
        wl = sum(l for _, l in wparts)
        writes += wp
        w_log += wl
        by_opcode_w[opc] += wp
        rp = rl = 0
        seen = set()
        for opnd in o["operands"]:
            if opnd in seen:
                continue
            seen.add(opnd)
            p, l = hbm_foot.get(opnd, (0, 0))
            if opc.endswith("-start") and opc != "copy-start":
                # async slice reads only the sliced region: approximate
                # by the op's own result part
                p = min(p, sum(pp for pp, _ in wparts)) if wparts else p
            rp += p
            rl += l
        reads += rp
        r_log += rl
        fb, mod = module_key(o["meta"])
        by_mod_traffic[(fb, mod)] += wp + rp

    # convolution MACs.  For ANY XLA conv: each output element is a sum
    # over (window x lhs-feature), so logical MACs = numel(output) x
    # prod(window sizes) x lhs_feature_size.  Physical model: the MXU
    # pads feature dims to 128 lanes — pad the lhs contracted feature
    # and every feature-labeled output dim ('f'/'i'/'o').
    macs_log = macs_phys = 0
    by_mod_macs = collections.Counter()
    for name, o in all_ops.items():
        if o["opcode"] != "convolution" or not o["dim_labels"]:
            continue
        out = _SHAPE_RE.findall(o["shape"])
        if not out:
            continue
        odims = [int(d) for d in out[0][1].split(",") if d]
        lhs_rhs, out_lbl = o["dim_labels"].split("->")
        lhs_lbl = lhs_rhs.split("_")[0]
        ln = o["operands"][0] if o["operands"] else None
        ldims = None
        if ln and ln in all_ops:
            lsh = _SHAPE_RE.findall(all_ops[ln]["shape"])
            if lsh:
                ldims = [int(d) for d in lsh[0][1].split(",") if d]
        if ldims is None or len(ldims) != len(lhs_lbl) or \
                len(odims) != len(out_lbl):
            continue
        win = 1
        wm = re.findall(r"size=([\dx]+)", o["window"])
        if wm:
            for d in wm[0].split("x"):
                win *= int(d)
        cf = ldims[lhs_lbl.index("f")] if "f" in lhs_lbl else 1
        numel_out = 1
        for d in odims:
            numel_out *= d
        m_log = numel_out * win * cf
        if not lhs_lbl.startswith("f"):
            # forward / input-grad conv: per window position a matmul
            # [pixels x Cin] @ [Cin x Cout] — K=Cin and N=Cout pad to
            # 128 lanes; M streams (8-sublane granule, negligible).
            outf = odims[out_lbl.index("f")] if "f" in out_lbl else 1
            pad = ((-(-cf // 128) * 128) / cf
                   * (-(-outf // 128) * 128) / outf)
        else:
            # kernel-grad conv (lhs f01b: batch is the contracted
            # feature): out labels put Ci on 'b' and Co on 'f'.  K =
            # batch x pixels is large (no pad); the matmul is
            # [Ci x K] @ [K x Co]: M=Ci pads to 8 sublanes, N=Co pads
            # to 128 lanes.
            di = odims[out_lbl.index("b")] if "b" in out_lbl else 1
            do = odims[out_lbl.index("f")] if "f" in out_lbl else 1
            pad = ((-(-di // 8) * 8) / di
                   * (-(-do // 128) * 128) / do)
        macs_log += m_log
        macs_phys += int(m_log * pad)
        fb, mod = module_key(o["meta"])
        by_mod_macs[(fb, mod)] += int(m_log * pad)

    tot = writes + reads
    print(f"HBM physical traffic: {tot / bs / 1e6:7.0f} MB/img "
          f"(writes {writes / bs / 1e6:.0f}, reads {reads / bs / 1e6:.0f}; "
          f"logical {(w_log + r_log) / bs / 1e6:.0f} MB/img, "
          f"pad x{tot / max(w_log + r_log, 1):.2f})")
    print(f"conv MACs: logical {macs_log / bs / 1e9:6.1f} GMAC/img, "
          f"physical {macs_phys / bs / 1e9:6.1f} GMAC/img "
          f"(pad x{macs_phys / max(macs_log, 1):.2f})")
    if args.img_s:
        gbs = tot / bs * args.img_s / 1e9
        tfs = 2 * macs_phys / bs * args.img_s / 1e12
        print(f"at {args.img_s} img/s: {gbs:6.1f} GB/s physical "
              f"= {100 * gbs / args.hbm_peak:5.1f}% of HBM peak; "
              f"{tfs:6.1f} TFLOP/s physical "
              f"= {100 * tfs / args.mxu_peak:5.1f}% of MXU peak")
    print("\n== physical HBM traffic by module ==")
    for (fb, mod), b in by_mod_traffic.most_common(args.top):
        print(f"  {fb} {mod:22s} {b / bs / 1e6:8.1f} MB/img")
    print("\n== physical conv MACs by module ==")
    for (fb, mod), m in by_mod_macs.most_common(args.top):
        print(f"  {fb} {mod:22s} {2 * m / bs / 1e9:8.1f} GFLOP/img")
    print("\n== physical HBM writes by opcode ==")
    for opc, b in by_opcode_w.most_common(10):
        print(f"  {opc:20s} {b / bs / 1e6:8.1f} MB/img")


if __name__ == "__main__":
    main()
