"""Registry-wide hidden-sort audit (round-11 session 6; executed-plan mode
added round 12, VERDICT r11 item 7).

Session 5 found a defect class — plans that exchange+sort a heavy side
where the other side is small enough for a per-partition hash build — by
reading the ~51 committed bench plans. This tool applies the same audit to
EVERY declared key: it builds each key's frame at the given SF, captures
`.explain("formatted")`, and reports the keys whose physical plan contains
a SortMergeJoin, with the join type feeding each side, so the triage
(bounded side -> hint/broadcast candidate; both sides user-proportional ->
SMJ is correct) can be done by hand.

STATIC vs EXECUTED (the round-11 false-positive lesson,
dedup_embedding_cosine): `explain("formatted")` before execution shows the
static plan (`AdaptiveSparkPlan isFinalPlan=false`); AQE may rewrite a
small SMJ to BroadcastHashJoin at runtime, so a static hit is not
necessarily a real sort at execution. With --executed the tool ALSO runs
each frame (collect(), bounded at audit SFs) and re-captures the same
DataFrame's explain, which now prints the AQE final plan
(isFinalPlan=true); the report then shows static AND executed strategy per
key, so triage starts from what actually ran.

Keys whose returned frame is localCheckpoint-materialized explain as
`Scan ExistingRDD`; for those the audit sees only the post-materialize
tail. That is the same caveat the round's plan captures carry — interior
stages are audited via their dedicated subplan dumps.

Usage: python tools/smj_audit.py [--executed] [sf_dir] [key ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from swallow_spark.registry import all_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _smj_hits(plan: str) -> list[str]:
    # typed header first; bare-node fallback so a localCheckpoint tail or
    # future explain-format drift cannot silently report 0 hits (ADVICE r11)
    hits = re.findall(r"SortMergeJoin (\w+)", plan)
    if not hits:
        hits = ["?"] * len(re.findall(r"\bSortMergeJoin\b", plan))
    return hits


def _final_section(plan: str) -> str:
    """The AQE final-plan section of a post-execution explain. After an
    action, a formatted explain prints the re-optimized final plan followed
    by an `== Initial Plan ==` subsection (the pre-AQE plan); scanning the
    whole text would double-count every node that survived AQE, so cut the
    initial-plan echo off."""
    return plan.split("== Initial Plan ==")[0]


def main() -> None:
    args = sys.argv[1:]
    executed = "--executed" in args
    if executed:
        args = [a for a in args if a != "--executed"]
    sf = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("smj_audit", cpus=cpus)
    qs = all_queries()
    names = args[1:] or sorted(qs)
    n_smj = 0
    n_runtime_smj = 0
    for name in names:
        try:
            df = qs[name].fn(spark, sf)
            plan = _explain(df)
        except Exception as exc:  # noqa: BLE001 — record and continue
            # exception class untruncated; only the message is capped
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:160]}")
            continue
        hits = _smj_hits(plan)
        if not hits:
            continue
        n_smj += 1
        line = f"{name}: SortMergeJoin x{len(hits)} ({', '.join(hits)})"
        if executed:
            try:
                df.collect()
                fin = _explain(df)
                if "isFinalPlan=true" not in fin:
                    line += " | executed: <no AQE final plan captured>"
                else:
                    fhits = _smj_hits(_final_section(fin))
                    if fhits:
                        n_runtime_smj += 1
                        line += (
                            f" | executed: SortMergeJoin x{len(fhits)}"
                            f" ({', '.join(fhits)})"
                        )
                    else:
                        strat = sorted(
                            set(
                                re.findall(
                                    r"\b(BroadcastHashJoin|ShuffledHashJoin|"
                                    r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                                    _final_section(fin),
                                )
                            )
                        )
                        line += (
                            " | executed: AQE-converted -> "
                            + (", ".join(strat) if strat else "no join node")
                        )
            except Exception as exc:  # noqa: BLE001
                line += f" | executed: ERROR {type(exc).__name__}: {str(exc)[:120]}"
        print(line)
    tailmsg = f"-- {n_smj} keys with static SortMergeJoin (of {len(names)} audited)"
    if executed:
        tailmsg += f"; {n_runtime_smj} still SMJ in the executed plan"
    print(tailmsg)


if __name__ == "__main__":
    main()
