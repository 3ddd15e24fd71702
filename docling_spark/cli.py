"""File-oriented CLI — the Spark twin of the reference's ``docling``
command (docling/cli/main.py:705-1224 ``convert``): convert local
document files and write one output file per (input, format).

    python -m docling_spark.cli convert SOURCES... \
        [--from FMT[,FMT...]] [--to md,text,json,yaml,doctags,itxt,html,\
html_split_page,doclang,dclx] [--output DIR] [--password PW]... \
        [--parallelism N] [--abort-on-error] [-v]

Spark-first even at file granularity: sources load as a ``binaryFile``
DataFrame, extraction runs through the same Arrow-batched mapInPandas
kernel the 10^12-turn table job uses (operators/extract_ops.py), and
serialization reuses the export sinks (operators/export.py) — the CLI is
a thin shell over the cluster path, never a second engine. Output
filenames mirror the reference's export_documents
(cli/export_utils.py): ``<stem>.<ext>`` in the output directory.
"""

from __future__ import annotations

import argparse
import base64
import pathlib
import sys

# md/text render from the document's extracted markdown; the rest are
# item-table serializers (the same sink registry the table job's --to
# flag uses)
_ITEM_FORMATS = ("json", "yaml", "doctags", "itxt", "html",
                 "html_split_page", "doclang", "dclx")
_ALL_FORMATS = ("md", "text") + _ITEM_FORMATS
_EXTENSIONS = {"md": "md", "text": "txt", "json": "json", "yaml": "yaml",
               "doctags": "doctags.txt", "itxt": "itxt", "html": "html",
               "html_split_page": "html", "doclang": "doclang",
               "dclx": "dclx", "vtt": "vtt"}


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="docling-spark",
        description="Convert documents through the Spark-native engine")
    sub = p.add_subparsers(dest="command", required=True)
    c = sub.add_parser("convert", help="convert files to structured text")
    c.add_argument("sources", nargs="+",
                   help="input files or directories (recursed)")
    c.add_argument("--from", dest="from_formats", default=None,
                   help="comma-separated allowed input formats; detected "
                        "formats outside the set become SKIPPED results "
                        "(the reference CLI's --from)")
    c.add_argument("--to", dest="to_formats", default="md",
                   help=f"comma-separated output formats "
                        f"({','.join(_ALL_FORMATS)}); default md")
    c.add_argument("--output", default=".",
                   help="output directory (created if missing)")
    c.add_argument("--password", action="append", default=[],
                   help="password to try for encrypted PDFs (repeatable)")
    c.add_argument("--parallelism", type=int, default=None,
                   help="Spark local[] core count (default: all cores)")
    c.add_argument("--abort-on-error", action="store_true",
                   help="exit non-zero if any document fails")
    c.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args(argv)
    bad = [f for f in args.to_formats.split(",") if f not in _ALL_FORMATS]
    if bad:
        p.error(f"unknown output format(s): {','.join(bad)}")
    return args


def _collect_files(sources: list[str]) -> list[pathlib.Path]:
    out: list[pathlib.Path] = []
    for s in sources:
        path = pathlib.Path(s)
        if path.is_dir():
            out.extend(sorted(f for f in path.rglob("*") if f.is_file()))
        elif path.is_file():
            out.append(path)
        else:
            raise FileNotFoundError(s)
    return out


def _payload_of(data: bytes) -> str:
    """Files enter the engine exactly like table payloads: text stays
    text, binary travels base64 (the format sniffers accept both
    spellings for every binary family)."""
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return base64.b64encode(data).decode("ascii")


def run_convert(args: argparse.Namespace) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from docling_spark.operators.export import export_items
    from docling_spark.operators.extract_ops import extract_turns

    files = _collect_files(args.sources)
    if not files:
        print("no input files", file=sys.stderr)
        return 2
    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    to_formats = args.to_formats.split(",")
    allowed = (frozenset(args.from_formats.split(","))
               if args.from_formats else None)

    cores = args.parallelism or "*"
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("docling-spark-cli")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rows = [
            (str(f), 0, "user", _payload_of(f.read_bytes()),
             f.suffix.lstrip(".").lower())
            for f in files
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string")
        # one file per task: the kernel cost is per-document CPU, and a
        # CLI batch is small — the same pinned fan-out rationale as the
        # table job's salting
        df = df.repartition(min(len(rows),
                                spark.sparkContext.defaultParallelism))
        extracted = extract_turns(
            df, pdf_passwords=tuple(args.password),
            allowed_formats=allowed).cache()

        item_cols = [f for f in to_formats if f in _ITEM_FORMATS]
        plan = extracted.select(
            F.col("conv_id").alias("path"), "status", "format",
            "extracted_text", "errors")
        for fmt in item_cols:
            ser = export_items(
                extracted.select(F.col("conv_id").alias("path"), "items"),
                fmt=fmt, keep_cols=("path",))
            plan = plan.join(ser, "path", "left")

        n_ok = n_fail = n_skip = 0
        for row in plan.toLocalIterator():
            stem = pathlib.Path(row["path"]).stem
            if row["status"] == "success":
                n_ok += 1
            elif row["status"] == "skipped":
                n_skip += 1
            else:
                n_fail += 1
            if args.verbose or row["status"] != "success":
                errs = "; ".join(e["message"] for e in (row["errors"] or []))
                print(f"{row['status']:8s} {row['path']}"
                      + (f"  [{errs}]" if errs else ""))
            if row["status"] != "success":
                continue
            for fmt in to_formats:
                ext = _EXTENSIONS[fmt]
                content = (row["extracted_text"]
                           if fmt in ("md", "text") else row[fmt])
                if content is None:
                    continue
                (out_dir / f"{stem}.{ext}").write_text(content)
        print(f"converted {n_ok} ok, {n_skip} skipped, {n_fail} failed "
              f"-> {out_dir}")
        if args.abort_on_error and n_fail:
            return 1
        return 0
    finally:
        spark.stop()


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    if args.command == "convert":
        return run_convert(args)
    return 2  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
