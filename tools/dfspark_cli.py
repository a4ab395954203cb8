"""datafusion-cli-shaped SQL shell over the compat layer.

The reference ships ``datafusion-cli`` (datafusion-cli/src/): a REPL that
accepts DataFusion-dialect SQL, ``CREATE EXTERNAL TABLE`` DDL, and a few
backslash meta-commands.  This is the same surface over Spark: every
statement goes through ``SessionContext.sql`` (dialect translation +
Catalyst planning), so a reference user's saved .sql scripts replay
unmodified.

    python tools/dfspark_cli.py                       # interactive
    python tools/dfspark_cli.py -c "SELECT 1"         # one statement
    python tools/dfspark_cli.py -f script.sql         # run a file
    python tools/dfspark_cli.py --register t=path.parquet -c "SELECT ..."

Meta-commands (datafusion-cli compatible):
    \\d           list registered tables        \\d t   describe table t
    \\q           quit                          \\?     help
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _split_statements(text: str) -> list[str]:
    """Split on ';' outside quotes/comments."""
    stmts, buf, i, n = [], [], 0, len(text)
    while i < n:
        c = text[i]
        if c in "'\"`":
            q, j = c, i + 1
            while j < n and text[j] != q:
                j += 2 if text[j:j + 2] == q * 2 else 1
            j = min(j + 1, n)
            buf.append(text[i:j])
            i = j
        elif text.startswith("--", i):
            j = text.find("\n", i)
            j = n if j < 0 else j
            buf.append(text[i:j])
            i = j
        elif c == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(c)
            i += 1
    if "".join(buf).strip():
        stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


def _run_one(ctx, sql: str, max_rows: int) -> None:
    from datafusion_spark.compat.dialect import DialectError

    t0 = time.perf_counter()
    try:
        df = ctx.sql(sql)
        df.show(n=max_rows, truncate=False)
        print(f"Elapsed {time.perf_counter() - t0:.3f} seconds.")
    except DialectError as e:
        print(f"Dialect error: {e}")
    except Exception as e:  # noqa: BLE001 — REPL must survive bad SQL
        msg = str(e).splitlines()
        print("Error:", msg[0] if msg else e)


def _meta(ctx, line: str) -> bool:
    """Handle a backslash meta-command; True if handled."""
    cmd, _, arg = line.partition(" ")
    if cmd == "\\q":
        raise SystemExit(0)
    if cmd == "\\?":
        print(__doc__)
        return True
    if cmd == "\\d":
        if arg.strip():
            ctx.spark.sql(f"DESCRIBE TABLE {arg.strip()}").show(100, truncate=False)
        else:
            for t in ctx.tables():
                print(t)
        return True
    return False


def main() -> None:
    ap = argparse.ArgumentParser(description="DataFusion-dialect SQL shell on Spark")
    ap.add_argument("-c", "--command", action="append", default=[],
                    help="run this statement and exit (repeatable)")
    ap.add_argument("-f", "--file", action="append", default=[],
                    help="run statements from this file and exit (repeatable)")
    ap.add_argument("--register", action="append", default=[], metavar="NAME=PATH",
                    help="register a parquet path as a table before running")
    ap.add_argument("--max-rows", type=int, default=40)
    args = ap.parse_args()

    from datafusion_spark.compat import SessionContext

    ctx = SessionContext()
    ctx.spark.sparkContext.setLogLevel("ERROR")
    for spec in args.register:
        name, _, path = spec.partition("=")
        ctx.register_parquet(name.strip(), path.strip())

    batch: list[str] = []
    for f in args.file:
        with open(f) as fh:
            batch.extend(_split_statements(fh.read()))
    for c in args.command:
        batch.extend(_split_statements(c))
    if batch:
        for sql in batch:
            _run_one(ctx, sql, args.max_rows)
        return

    print("dfspark-cli (DataFusion dialect on Spark). \\? for help, \\q to quit.")
    buf: list[str] = []
    while True:
        try:
            line = input("> " if not buf else "  ")
        except EOFError:
            break
        if not buf and line.strip().startswith("\\"):
            if _meta(ctx, line.strip()):
                continue
        buf.append(line)
        text = "\n".join(buf)
        if ";" in line:
            for sql in _split_statements(text):
                _run_one(ctx, sql, args.max_rows)
            buf = []


if __name__ == "__main__":
    main()
