#!/usr/bin/env python3
"""Per-gate bench drift report (round-13 queue #6).

Compares two bench artifacts' per-query deciseconds (`qv`, positionally
joined to the sorted gate-name list each artifact was measured against)
and reports every gate slower than --factor (default 2x) vs the prior
round, plus gates added/dropped between the rounds.

Usage:
  python3 tools/benchdrift.py PREV_BENCH PREV_NAMES NEW_BENCH NEW_NAMES \
      [--factor 2.0] [--floor-ds 3] [--detail BENCH_DETAIL.json]

--detail takes the NEW run's full-precision sidecar (target/
bench_detail.json, copied beside the round artifact as
BENCH_DETAIL_r{N}.json at certification). With it, every flagged
regression is AUTO-ATTRIBUTED from its own samples instead of by
narrative (round-19 queue #2 — the sim_pq_train adjudications).
The artifact's qv is already min-of-samples, so a flagged gate has
EVERY sample past the bar; the attribution reads the loadavg for whom
to blame and the samples' spread for how much to trust even the min:
  SUSTAINED-LOAD  — the run's 1-minute loadavg shows external load
                    (>= --ld-bar, default 8); the gate never saw a calm
                    window, so the row is evidence about the HOST
  GENUINE         — a calm host; the regression is the code's
  LOAD-UNKNOWN    — the sidecar carries no loadavg; adjudicate by hand
A >= 2x spread between samples additionally marks at least one pass as
contaminated (the min is then an upper bound on the true cost).

BENCH args accept either the driver's BENCH_r{N}.json (object with a
`parsed` payload), a raw Bench stdout JSON object, or a log file whose
last `{"metric":...}` line is the payload. NAMES args accept either a
CORRECTNESS_r{N}.json (sorted keys = gate order) or a Verify output
directory (sorted subdirectory names = gate order).

Exit code: 0 when the report ran — drift itself never fails the run;
the reader adjudicates. Nonzero ONLY for unusable inputs: missing/
pre-round-13 payloads, a names/qv length mismatch, a qsig signature
mismatch (round-15+ artifacts), or a sum(qv)-vs-total reconciliation
failure — all cases where any drift numbers would be misattributed.
"""
import json
import os
import re
import sys


def load_bench(path):
    raw = open(path).read()
    try:
        obj = json.loads(raw)
        if isinstance(obj, dict) and "parsed" in obj:
            obj = obj["parsed"]
        if isinstance(obj, dict) and "qv" in obj:
            return obj
        if isinstance(obj, dict) and "metric" in obj:
            sys.exit(f"benchdrift: {path} carries no per-query qv "
                     "(pre-round-13 artifact) — nothing to diff")
    except json.JSONDecodeError:
        pass
    last = None
    for m in re.finditer(r'\{"metric".*\}', raw):
        last = m.group(0)
    if last is None:
        sys.exit(f"benchdrift: no bench payload found in {path}")
    obj = json.loads(last)
    if "qv" not in obj:
        sys.exit(f"benchdrift: {path} carries no per-query qv "
                 "(pre-round-13 artifact) — nothing to diff")
    return obj


def load_names(path):
    if os.path.isdir(path):
        return sorted(d for d in os.listdir(path)
                      if os.path.isdir(os.path.join(path, d)))
    return sorted(json.load(open(path)).keys())


def main(argv):
    args, opts = [], {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                k, v = a.lstrip("-").split("=", 1)
            elif i + 1 < len(argv):
                k, v = a.lstrip("-"), argv[i + 1]
                i += 1
            else:
                sys.exit(f"benchdrift: option {a} needs a value")
            opts[k] = v
        else:
            args.append(a)
        i += 1
    if len(args) != 4:
        sys.exit(__doc__)
    factor = float(opts.get("factor", 2.0))
    floor = int(opts.get("floor-ds", 3))
    ld_bar = float(opts.get("ld-bar", 8.0))
    detail = None
    if "detail" in opts:
        detail = json.load(open(opts["detail"]))
        if "samples" not in detail:
            sys.exit(f"benchdrift: {opts['detail']} carries no per-gate "
                     "samples — not a bench_detail sidecar")
    prev_b, prev_n = load_bench(args[0]), load_names(args[1])
    new_b, new_n = load_bench(args[2]), load_names(args[3])
    for tag, b, n in (("prev", prev_b, prev_n), ("new", new_b, new_n)):
        if len(b["qv"]) != len(n):
            sys.exit(f"benchdrift: {tag} qv has {len(b['qv'])} entries "
                     f"but {len(n)} gate names — wrong names source?")
        # keyed join (r14 ADVICE): artifacts since round 15 carry qsig =
        # md5-8 of the sorted name list qv was measured against; a names
        # source with the right LENGTH but the wrong round now fails loud
        # instead of silently misattributing every drift number
        if "qsig" in b:
            import hashlib
            sig = hashlib.md5("\n".join(n).encode()).hexdigest()[:8]
            if sig != b["qsig"]:
                sys.exit(f"benchdrift: {tag} names source signature {sig} "
                         f"!= artifact qsig {b['qsig']} — wrong names source")
        # sum(qv) must reconcile with the reported total up to per-gate
        # decisecond rounding (covers pre-qsig artifacts too). With errored
        # gates (negative qv sentinels) their elapsed time may be inside
        # the total but is excluded from the sum, so the check degrades to
        # ONE-SIDED instead of being skipped (round-17 ADVICE: a fully
        # skipped check let a corrupted total through on any artifact with
        # a single errored gate): the non-errored sum can never EXCEED the
        # reported total past tolerance.
        ok = [v for v in b["qv"] if v >= 0]
        tol = 0.06 * len(ok) + 1.0
        if len(ok) < len(b["qv"]):
            print(f"benchdrift: {tag} has {len(b['qv']) - len(ok)} errored "
                  "gate(s) — sum-vs-total reconciliation is one-sided")
            if sum(ok) / 10.0 - float(b.get("value", 0)) > tol:
                sys.exit(f"benchdrift: {tag} non-errored sum(qv)={sum(ok)/10.0}s "
                         f"exceeds reported total {b.get('value')}s (tol {tol:.1f})")
            continue
        if abs(sum(ok) / 10.0 - float(b.get("value", 0))) > tol:
            sys.exit(f"benchdrift: {tag} sum(qv)={sum(ok)/10.0}s does not "
                     f"reconcile with total {b.get('value')}s (tol {tol:.1f})")
    # errored gates (negative qv sentinels) are EXCLUDED from the join:
    # keeping them would render a broken gate as a dramatic ">= 2x FASTER"
    # row (prev=120ds, new=-1ds) or mask a real regression — they are
    # reported separately instead (round-16 review)
    prev = {n: v for n, v in zip(prev_n, prev_b["qv"]) if v >= 0}
    new = {n: v for n, v in zip(new_n, new_b["qv"]) if v >= 0}
    err_prev = sorted(n for n, v in zip(prev_n, prev_b["qv"]) if v < 0)
    err_new = sorted(n for n, v in zip(new_n, new_b["qv"]) if v < 0)
    if err_prev or err_new:
        print(f"errored gates excluded from the diff: prev={err_prev} new={err_new}")
    shared = sorted(set(prev) & set(new))
    added = sorted(set(new) - set(prev))
    dropped = sorted(set(prev) - set(new))
    print(f"benchdrift: prev total {prev_b.get('value')}s over {len(prev)} gates, "
          f"new total {new_b.get('value')}s over {len(new)} gates "
          f"(factor {factor}x, floor {floor}ds)")
    regressions = []
    for g in shared:
        base = max(prev[g], floor)  # floor damps noise on sub-300ms gates
        if new[g] >= factor * base:
            regressions.append((g, prev[g], new[g]))
    if regressions:
        print(f"\n{len(regressions)} gate(s) >= {factor}x slower:")
        print(f"{'gate':44} {'prev_ds':>8} {'new_ds':>8} {'ratio':>6}  attribution")
        # sanity-join the sidecar to THIS artifact before trusting it: the
        # flagged gate's min sample must reproduce the artifact's qv entry
        # (same run), else the sidecar is from a different invocation and
        # its samples would mis-attribute the row
        for g, p, q in sorted(regressions, key=lambda r: -r[2] / max(r[1], 1)):
            attr = "(no sidecar — adjudicate by hand)"
            if detail is not None:
                ss = detail.get("samples", {}).get(g)
                if ss is None:
                    attr = "(gate missing from sidecar)"
                elif abs(min(ss) - q * 100) > 50:
                    # the artifact's qv IS round(min-sample / 100); allow
                    # the half-decisecond rounding band instead of an
                    # exact re-round (Python rounds half-to-even, the
                    # artifact rounds half-up — an exact compare spuriously
                    # rejects genuine sidecars at even-half boundaries)
                    attr = (f"(sidecar min {min(ss)}ms != artifact {q}ds "
                            "— sidecar is from a different run)")
                else:
                    lds = [float(x) for x in detail.get("ld", [])]
                    samp = ",".join(f"{x / 1000.0:.1f}s" for x in ss)
                    # qv is already min-of-samples, so every sample of a
                    # flagged gate is past the bar; spread says whether
                    # even the min is trustworthy, loadavg says who to
                    # blame
                    spread = ("; samples disagree "
                              f"{max(ss) / max(min(ss), 1):.1f}x — at least "
                              "one pass contaminated, the min is an upper "
                              "bound on true cost"
                              ) if max(ss) >= 2 * min(ss) else ""
                    if not lds or max(lds) < 0:
                        attr = (f"LOAD-UNKNOWN — all samples [{samp}] past "
                                "the bar but the sidecar carries no "
                                f"loadavg; adjudicate by hand{spread}")
                    elif max(lds) >= ld_bar:
                        attr = (f"SUSTAINED-LOAD — all samples [{samp}] past "
                                f"the bar under ld {lds[0]:.1f}->{lds[-1]:.1f}"
                                f" (>= {ld_bar}); rerun calm before blaming "
                                f"the code{spread}")
                    else:
                        attr = (f"GENUINE — all samples [{samp}] past the "
                                f"bar on a calm host (ld {lds[0]:.1f}->"
                                f"{lds[-1]:.1f}){spread}")
            print(f"{g:44} {p:8d} {q:8d} {q / max(p, 1):6.1f}  {attr}")
    else:
        print("\nno per-gate regressions past the factor.")
    if added:
        print(f"\nadded gates ({len(added)}): "
              + ", ".join(f"{g}={new[g]}ds" for g in added))
    if dropped:
        print(f"\ndropped gates ({len(dropped)}): " + ", ".join(dropped))
    imp = [(g, prev[g], new[g]) for g in shared
           if prev[g] >= factor * max(new[g], floor)]
    if imp:
        print(f"\n{len(imp)} gate(s) >= {factor}x FASTER: "
              + ", ".join(f"{g} {p}→{q}ds" for g, p, q in
                          sorted(imp, key=lambda r: -r[1] / max(r[2], 1))[:10]))


if __name__ == "__main__":
    main(sys.argv[1:])
