"""Cross-round per-query minima — the mechanized regression rule.

The standing bench-weather lesson (SURVEY §8, rounds 4–6): this host
swings ±20–50% between measurement windows for IDENTICAL code, so the
only honest cross-round comparator is each query's MINIMUM across all
recorded rounds. Rounds 4–6 adjudicated that by hand (worktree
experiments, prose); this tool mechanizes it: read every BENCH_r*.json
(plus, optionally, a fresh local bench JSON for the round in
progress), compute per-query historical minima, and flag only the
queries whose CURRENT round's time exceeds the historical minimum by
more than the threshold (default 1.25x) — a spread the weather alone
has not produced for a steady query.

Usage:
    python tools/minima_report.py [current_bench.json] [--threshold=1.25]
                                  [--md=MINIMA.md]

- With no argument, the latest BENCH_r*.json is treated as current.
- Only files whose "sf" matches the current run's are compared.
- Prints ONE JSON line {flagged, n_queries, threshold, ...} and writes
  the markdown table (default MINIMA.md) the next judge can read
  without a worktree experiment.

Reading a flag honestly: a flagged query is WORTH INVESTIGATING, not
proof of regression — a branch added this round raises its slot's
whole-query time legitimately (check the per-branch timings in the
BENCH JSON before concluding), and a query can simply never have hit a
quiet window yet this round. An empty flag list IS meaningful: no
query's best-observed time degraded past the threshold.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


_NOT_QUERIES = {"value", "sf", "n_queries", "r3_equivalent_total",
                "sf1_equivalent_total", "sf1_frozen_bar"}

# Branch flags already adjudicated by controlled experiment — carried
# here so a recurring flag renders WITH its verdict instead of reading
# as an open item every round. r11 evidence (SURVEY §8): the r5 CODE,
# re-run in an r11 quiet window from a worktree at the r5 commit,
# misses its own r5 minima by 1.4–2.5x on all five flagged branches
# (funnel 1.036 vs the 0.564 floor, session 1.181 vs 0.805, minhash
# pairs 6.4 vs 2.519, clusters 3.991 vs 2.131, near-dup pairs 2.529
# vs 1.768); an interleaved HEAD-vs-r5-code A/B flips sign across
# reps (rep1 HEAD faster on session/funnel/near-dup, rep2 r5 faster)
# and the filtered optimized plans are bit-identical (the branch
# filter prunes grown union legs below the global sort). The r5
# minima are quiet-era environment floors this host no longer
# reaches, not code regressions.
ADJUDICATED: dict[tuple[str, str], str] = {
    ("dedup_minhash_lsh", "pairs"): "r11: cleared — env floor (r5 code "
    "misses its own minimum 2.5x today; HEAD beats r5 code solo)",
    ("dedup_minhash_lsh", "clusters"): "r11: cleared — env floor (r5 "
    "code 1.87x its own minimum today; HEAD == r5 code solo)",
    ("sessionize_reduce", "funnel"): "r11: cleared — env floor (r5 code "
    "1.84x its own minimum today; A/B sign flips; plan identical)",
    ("sessionize_reduce", "session"): "r11: cleared — env floor (r5 "
    "code 1.47x its own minimum today; A/B sign flips; plan identical)",
    ("sim_near_dup_embeddings", "pairs"): "r11: cleared — env floor "
    "(r5 code 1.43x its own minimum today; interleaved A/B ratio 1.00)",
}


def _extract_branches(d: dict) -> dict[str, dict[str, float]]:
    """Per-branch timings {slot: {branch: sec}} from any BENCH shape.
    For the truncated ``tail`` shape, re-parse the two-level dict from
    the fragment after ``"branches"`` with a tolerant regex (an
    incomplete trailing slot is simply dropped)."""
    for src in (d, d.get("parsed") or {}):
        b = src.get("branches")
        if isinstance(b, dict) and all(
            isinstance(v, dict) for v in b.values()
        ):
            return {
                s: {k: float(t) for k, t in bs.items()
                    if isinstance(t, (int, float))}
                for s, bs in b.items()
            }
    tail = d.get("tail")
    if isinstance(tail, str) and '"branches"' in tail:
        frag = tail.split('"branches"', 1)[1]
        # r11 (ADVICE): bound the scan to the balanced-brace object
        # immediately after the key — the old whole-fragment scan
        # would misparse ANY later flat numeric dict (e.g. a future
        # per-query weather map) as branch timings. A truncated tail
        # (no matching close) keeps everything to the end: incomplete
        # trailing slots are dropped by the inner regex as before.
        start = frag.find("{")
        if start < 0:
            return {}
        depth, end = 0, len(frag)
        for i in range(start, len(frag)):
            if frag[i] == "{":
                depth += 1
            elif frag[i] == "}":
                depth -= 1
                if depth == 0:
                    end = i + 1
                    break
        frag = frag[start:end]
        out: dict[str, dict[str, float]] = {}
        for slot_m in re.finditer(
            r'"([A-Za-z0-9_]+)"\s*:\s*\{([^{}]*)\}', frag
        ):
            slot, body = slot_m.group(1), slot_m.group(2)
            pairs = re.findall(
                r'"([A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)', body
            )
            if pairs:
                out[slot] = {k: float(v) for k, v in pairs}
        return out
    return {}


def _extract(d: dict) -> tuple[dict | None, float | None]:
    """Pull (queries, sf) out of any of the three shapes a BENCH file
    takes: bench.py's own JSON line, the driver wrapper with a
    ``parsed`` copy, or the driver wrapper where only a 2000-char
    ``tail`` fragment of the (now longer-than-2000-char) line survived
    — there, recover every complete ``"query": seconds`` pair before
    the ``"branches"`` key (partial history beats none; queries cut
    off the fragment's head simply don't contribute minima)."""
    if isinstance(d.get("queries"), dict):
        return d["queries"], d.get("sf")
    p = d.get("parsed")
    if isinstance(p, dict) and isinstance(p.get("queries"), dict):
        return p["queries"], p.get("sf", d.get("sf"))
    tail = d.get("tail")
    if isinstance(tail, str):
        frag = tail.split('"branches"')[0]
        pairs = re.findall(
            r'"([A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)', frag
        )
        qs = {k: float(v) for k, v in pairs if k not in _NOT_QUERIES}
        if qs:
            return qs, d.get("sf")
    return None, None


def load_rounds(
    repo: str,
) -> list[tuple[str, dict, float | None, dict]]:
    out = []
    for p in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        try:
            d = json.load(open(p))
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(d, dict):
            continue
        qs, sf = _extract(d)
        if qs:
            out.append((os.path.basename(p), qs, sf, _extract_branches(d)))
    return out


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    threshold = 1.25
    md_path = os.path.join(repo, "MINIMA.md")
    current_path = None
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1])
        elif a.startswith("--md="):
            md_path = a.split("=", 1)[1]
        elif not a.startswith("--"):
            current_path = a

    rounds = load_rounds(repo)
    if current_path is not None:
        cur_name = os.path.basename(current_path)
        cur_doc = json.load(open(current_path))
        cur_qs, sf = _extract(cur_doc)
        cur_br = _extract_branches(cur_doc)
        if cur_qs is None:
            print(json.dumps({"error": f"no queries in {current_path}"}))
            return 1
    elif rounds:
        cur_name, cur_qs, sf, cur_br = rounds[-1]
        rounds = rounds[:-1]
    else:
        print(json.dumps({"error": "no BENCH_r*.json found"}))
        return 1

    hist = [(n, q, b) for n, q, s, b in rounds if s == sf and n != cur_name]
    minima: dict[str, tuple[float, str]] = {}
    br_minima: dict[tuple[str, str], tuple[float, str]] = {}
    for name, qdict, bdict in hist:
        for q, t in qdict.items():
            if q not in minima or t < minima[q][0]:
                minima[q] = (t, name)
        for slot, bs in bdict.items():
            for b, t in bs.items():
                k = (slot, b)
                if k not in br_minima or t < br_minima[k][0]:
                    br_minima[k] = (t, name)

    # branched slots legitimately grow whole-slot time as strategies
    # are added; their flags point at the per-branch timings, not the
    # whole-slot ratio
    try:
        sys.path.insert(0, repo)
        from bench import BRANCHED  # noqa: E402

        branched_slots = set(BRANCHED)
    except ImportError:
        branched_slots = set()
    try:
        from bench import COLUMN_GROWN  # noqa: E402

        column_grown = dict(COLUMN_GROWN)
    except ImportError:
        column_grown = {}

    ratios = {}
    prelim = []
    for q, t in sorted(cur_qs.items()):
        if q in minima:
            mn, src = minima[q]
            ratio = round(t / mn, 3) if mn > 0 else None
            if ratio is not None:
                ratios[q] = ratio
        else:
            mn, src, ratio = None, "(new this round)", None
        prelim.append((q, t, mn, src, ratio))

    # Weather normalization — the mechanized form of the r6 judge's
    # adjudication: host slowdown inflates EVERY query's ratio
    # uniformly (verified by the r5-code worktree experiment), while a
    # real regression is query-specific. The median ratio estimates
    # the day's weather factor; a query flags when it exceeds the
    # threshold on TOP of that. Raw flags are reported alongside so a
    # uniformly-slow round is still visible as such.
    srt = sorted(ratios.values())
    median_ratio = srt[len(srt) // 2] if srt else 1.0
    weather = max(1.0, median_ratio)

    rows = []
    flagged, flagged_raw = [], []
    for q, t, mn, src, ratio in prelim:
        raw_flag = ratio is not None and ratio > threshold
        norm = round(ratio / weather, 3) if ratio is not None else None
        flag = norm is not None and norm > threshold
        if raw_flag:
            flagged_raw.append(q)
        if flag:
            flagged.append(q)
        rows.append(
            (q, t, mn, src, ratio, norm, flag, q in branched_slots,
             column_grown.get(q))
        )

    # Per-BRANCH diff (r9 judge item): a branched slot's whole-query
    # flag is routinely adjudicated as growth, which could HIDE a
    # genuine regression in one of its strategies — so also diff each
    # branch's marginal timing against its own cross-round minimum,
    # with the same weather normalization. A branch flag is
    # query-AND-strategy-specific: weather can't produce it, growth
    # can't explain it (the branch's work is fixed once landed).
    br_rows = []
    br_flagged = []
    for slot in sorted(cur_br):
        for b, t in sorted(cur_br[slot].items()):
            k = (slot, b)
            if k in br_minima:
                mn, src = br_minima[k]
                ratio = round(t / mn, 3) if mn > 0 else None
            else:
                mn, src, ratio = None, "(new this round)", None
            norm = round(ratio / weather, 3) if ratio is not None else None
            flag = (norm is not None and norm > threshold
                    and t - (mn or 0) > 0.35)  # absolute floor: sub-
            # 0.35 s branch deltas are scheduler noise, not signal
            adj = ADJUDICATED.get(k)
            if flag and adj is None:
                br_flagged.append(f"{slot}:{b}")
            br_rows.append((slot, b, t, mn, src, ratio, norm, flag, adj))

    lines = [
        "# MINIMA — cross-round per-query bench minima",
        "",
        f"Current: `{cur_name}` (sf={sf}); history: "
        f"{len(hist)} comparable rounds; flag rule: ratio > "
        f"{threshold} x median ratio ({median_ratio} — the day's "
        "weather factor: host slowdown is uniform across untouched "
        "queries, per the r6 worktree experiment, so only "
        "query-SPECIFIC excess flags). Generated by "
        "`tools/minima_report.py` — the mechanized per-query-minima "
        "rule (SURVEY §8 bench-weather notes). A flag means "
        "INVESTIGATE, not proven regression; 'branched' slots grew "
        "hash-checked strategies after their minima — read the "
        "per-branch timings in the BENCH JSON before concluding — and "
        "'columns grew' slots added computed columns to the same scan "
        "(bench.COLUMN_GROWN records what and when), the other "
        "legitimate growth class.",
        "",
        "| query | current s | hist. min s | min round | ratio | "
        "normalized | flag |",
        "|---|---|---|---|---|---|---|",
    ]
    for q, t, mn, src, ratio, norm, flag, is_branched, grown in rows:
        note = "**FLAG**" if flag else ""
        if flag and is_branched:
            note += " (branched)"
        if flag and grown:
            note += f" (columns grew: {grown})"
        lines.append(
            f"| {q} | {t} | {mn if mn is not None else '—'} | {src} | "
            f"{ratio if ratio is not None else '—'} | "
            f"{norm if norm is not None else '—'} | {note} |"
        )
    lines.append("")
    if br_rows:
        lines += [
            "## Per-branch minima (marginal strategy timings)",
            "",
            "Each branch's timed marginal cost vs its own cross-round "
            "minimum, weather-normalized by the same median ratio. A "
            "branch flag cannot be explained by slot growth (the "
            "branch's work is fixed once landed) — it is the "
            "regression signal the whole-slot table can hide. "
            "Sub-0.35 s absolute deltas never flag (scheduler noise "
            "floor, same convention as SURVEY §8).",
            "",
            "| slot | branch | current s | hist. min s | min round | "
            "ratio | normalized | flag |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for slot, b, t, mn, src, ratio, norm, flag, adj in br_rows:
            note = "**FLAG**" if flag else ""
            if flag and adj:
                note = f"adjudicated ({adj})"
            lines.append(
                f"| {slot} | {b} | {t} | "
                f"{mn if mn is not None else '—'} | {src} | "
                f"{ratio if ratio is not None else '—'} | "
                f"{norm if norm is not None else '—'} | "
                f"{note} |"
            )
        lines.append("")
    with open(md_path, "w") as f:
        f.write("\n".join(lines))

    print(
        json.dumps(
            {
                "metric": "cross_round_minima",
                "current": cur_name,
                "sf": sf,
                "threshold": threshold,
                "median_ratio": median_ratio,
                "n_queries": len(rows),
                "n_history_rounds": len(hist),
                "flagged": flagged,
                "flagged_raw_over_threshold": flagged_raw,
                "branch_flagged": br_flagged,
                "n_branch_timings": len(br_rows),
                "md": md_path,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
