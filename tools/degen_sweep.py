#!/usr/bin/env python
"""Adversarial-corpus sweep: run every registry query's Spark side against a
degenerate corpus directory, classifying outcomes.

The round-7 method (COVERAGE.md degenerate-corpus campaign): a typed
ValueError/AssertionError with a diagnosable message is an acceptable
fail-loud for fitted operators on impossible input; ANY other exception
(ANSI DIVIDE_BY_ZERO, CAST_OVERFLOW, numpy crashes, py4j analysis errors)
is a defect to fix or pin. Queries that run are exercised to completion
through a noop sink, so executor-side failures surface too.

Usage: python tools/degen_sweep.py <corpus_dir> [name_filter_substr]
Prints one line per non-OK query and a final summary.
"""

from __future__ import annotations

import os
import sys
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

from gpu_telemetry_lakehouse_spark.queries import QUERIES  # noqa: E402
from gpu_telemetry_lakehouse_spark.session import get_spark  # noqa: E402


def _worker_raise_is_ours(msg: str) -> bool:
    """A Python-worker ValueError counts as a typed fail-loud only when the
    RAISING frame (the last ``File "..."`` line before the final ValueError
    in the worker traceback) is this package's own code — a diagnosed
    refusal authored at the raise site. A raw library ValueError escaping a
    kernel (e.g. numpy's 'all input arrays must have the same shape' from
    an unguarded np.stack) is exactly the defect class the sweep exists to
    catch; the pre-r9-review blanket 'ValueError:' substring match counted
    those as typed and made the sweep blind to them."""
    last_file, verdict = None, False
    for ln in msg.splitlines():
        s = ln.strip()
        if s.startswith('File "'):
            last_file = s
        elif s.startswith("ValueError") and last_file is not None:
            verdict = "gpu_telemetry_lakehouse_spark" in last_file
    return verdict


def main() -> None:
    corpus = sys.argv[1]
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(app="degen-sweep")
    ok, typed, defect = [], [], []
    for name, fn in QUERIES.items():
        if filt and filt not in name:
            continue
        if os.environ.get("DEGEN_VERBOSE"):
            print(f"RUN    {name}", flush=True)
        try:
            fn(spark, corpus).write.format("noop").mode("overwrite").save()
            ok.append(name)
        except (ValueError, AssertionError) as e:
            typed.append((name, f"{type(e).__name__}: {e}"))
            print(f"TYPED  {name}: {type(e).__name__}: {str(e)[:140]}", flush=True)
        except Exception as e:
            # engine-authored plan-side refusals (F.raise_error guards, e.g.
            # the sentinel-timestamp span guard) and Python-worker-raised
            # ValueErrors (our pandas-UDF kernels' diagnosed refusals, which
            # surface wrapped as PythonException) are typed fail-louds too —
            # they carry a diagnosable message by construction
            if "USER_RAISED_EXCEPTION" in str(e) or _worker_raise_is_ours(
                str(e)
            ):
                msg = str(e).splitlines()[0][:160]
                typed.append((name, msg))
                print(f"TYPED  {name}: {msg}", flush=True)
                continue
            nonempty = [ln for ln in str(e).splitlines() if ln.strip()]
            msg = nonempty[0][:200] if nonempty else repr(e)[:200]
            defect.append((name, f"{type(e).__name__}: {msg}"))
            print(f"DEFECT {name}: {type(e).__name__}: {msg}", flush=True)
            if os.environ.get("DEGEN_TRACE"):
                traceback.print_exc()
    print(
        f"\n== {os.path.basename(corpus)}: {len(ok)} ok, "
        f"{len(typed)} typed fail-loud, {len(defect)} defects"
    )
    for name, m in defect:
        print(f"  DEFECT {name}: {m}")


if __name__ == "__main__":
    main()
