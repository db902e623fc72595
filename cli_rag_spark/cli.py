"""Command-line surface — the engine's analog of the reference's four
binaries (makefile:14-17), batch-shaped:

| reference binary                 | engine command |
|---|---|
| bin/build-vector-db-from-server  | ``index``      (text/parquet → chunk → embed → parquet [+ .vdb]) |
| bin/rag-with-vdb-cos-client      | ``query``      (one-shot: embed text → top-k → context/prompt) |
| bin/embedding-from-server-cli    | ``embedding``  (print one embedding vector) |
| (no analog — our extension)      | ``run``        (execute a registered engine query at an sf dir) |

The reference CLI is positional-only (`text host port slice_len
out.vdb`, build-vector-db-from-server.c:31-39; `host port n_tokens
vdb k emb_host emb_port`, multirag.c:338-351). We keep the same
parameters as named flags with the reference's documented defaults
(chunk size 2000, README.md:47; k 3, README.md:51). The interactive
REPL/LLM-completion half (multirag.c:394-456) is out of the batch
engine's scope by design (SURVEY §2.a R18).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cli_rag_spark", description="PySpark-native CLI-RAG engine"
    )
    p.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    ix = sub.add_parser("index", help="build a vector index (reference: build-vector-db-from-server)")
    ix.add_argument("input", help="input corpus: parquet table or text file/dir")
    ix.add_argument("--format", choices=["parquet", "text", "jsonl"], default="parquet")
    ix.add_argument("--chunk-size", type=int, default=2000, help="chars per chunk (README.md:47)")
    ix.add_argument("--chunk-mode", choices=["clean", "reference", "fixed"], default="clean")
    ix.add_argument("--embedder", choices=["mock", "http"], default="mock")
    ix.add_argument("--dim", type=int, default=64)
    ix.add_argument("--host", default=None, help="embedding server host (http mode)")
    ix.add_argument("--port", default=None, help="embedding server port (http mode)")
    ix.add_argument("--out", required=True, help="output parquet path")
    ix.add_argument("--vdb", default=None, help="also export a .vdb file (vector-db.c:42-79 layout)")

    q = sub.add_parser("query", help="one-shot top-k retrieval (reference: rag-with-vdb-cos-client)")
    q.add_argument("index", help="index path: parquet dir or .vdb file")
    q.add_argument("--text", required=True, help="query text")
    q.add_argument("-k", type=int, default=3, help="results (README.md:51)")
    q.add_argument("--embedder", choices=["mock", "http"], default="mock")
    q.add_argument("--dim", type=int, default=64)
    q.add_argument("--host", default=None)
    q.add_argument("--port", default=None)
    q.add_argument("--show-prompt", action="store_true", help="print the assembled instruct prompt")

    e = sub.add_parser("embedding", help="print one embedding (reference: embedding-from-server-cli)")
    e.add_argument("--text", required=True)
    e.add_argument("--embedder", choices=["mock", "http"], default="mock")
    e.add_argument("--dim", type=int, default=64)
    e.add_argument("--host", default=None)
    e.add_argument("--port", default=None)

    r = sub.add_parser("run", help="run a registered engine query")
    r.add_argument("name", help="query name (see `run --list`)" , nargs="?")
    r.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    r.add_argument("--list", action="store_true", help="list registered queries")
    r.add_argument("--limit", type=int, default=20, help="max rows to print")
    return p


def _session(args):
    from cli_rag_spark.session import get_session

    return get_session("cli-rag-spark-cli", master=args.master)


def _embed_query_vec(args) -> list[float]:
    if args.embedder == "mock":
        from cli_rag_spark.operators.embed import mock_embed_py

        return mock_embed_py(args.text, args.dim)
    from cli_rag_spark.operators.embed import http_embed_one

    return http_embed_one(args.text, host=args.host, port=args.port)


def cmd_index(args) -> int:
    from cli_rag_spark.operators.index import build_index
    from cli_rag_spark.sources.documents import load_documents
    from cli_rag_spark.sources.vdb import write_vdb

    spark = _session(args)
    docs = load_documents(spark, args.input, fmt=args.format)
    kwargs = {}
    if args.embedder == "http":
        kwargs = {"host": args.host, "port": args.port}
    idx = build_index(
        docs,
        out_path=args.out,
        chunk_size=args.chunk_size,
        chunk_mode=args.chunk_mode,
        embed_mode=args.embedder,
        dim=args.dim,
        **kwargs,
    )
    n = spark.read.parquet(args.out).count()
    print(f"indexed {n} chunks -> {args.out}")
    if args.vdb:
        written = write_vdb(
            idx.select("id", "embedding", F.col("chunk_text").alias("text")), args.vdb
        )
        print(f"exported {written} rows -> {args.vdb}")
    return 0


def cmd_query(args) -> int:
    from pyspark.sql import Window

    from cli_rag_spark.operators.context import assemble_context, rag_prompt
    from cli_rag_spark.operators.topk import topk, validate_topk
    from cli_rag_spark.sources.vdb import read_vdb

    spark = _session(args)
    if args.index.endswith(".vdb"):
        idx = read_vdb(spark, args.index)
        text_col = "text"
    else:
        idx = spark.read.parquet(args.index)
        text_col = "chunk_text" if "chunk_text" in idx.columns else "text"
    validate_topk(idx, args.k)  # n < k is an error (vector-db.c:160-163)
    qvec = _embed_query_vec(args)
    hits = topk(idx, qvec, args.k, id_col="id").withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("dist").asc(), F.col("id").asc()))
    )
    rows = hits.select("rank", "id", "dist", text_col).collect()
    for r in rows:
        preview = (r[text_col] or "").replace("\n", " ")[:96]
        print(f"#{r['rank']}  id={r['id']}  dist={r['dist']:.6f}  {preview}")
    if args.show_prompt:
        ctx = assemble_context(
            hits.select("rank", F.col(text_col).alias("text")), text_col="text"
        )
        prompt_df = ctx.select(rag_prompt(F.col("context"), F.lit(args.text)).alias("p"))
        print("---")
        print(prompt_df.collect()[0]["p"])
    return 0


def cmd_embedding(args) -> int:
    vec = _embed_query_vec(args)
    print(json.dumps(vec))
    return 0


def cmd_run(args) -> int:
    from cli_rag_spark.plans import registry

    queries = registry.all_queries()
    if args.list or not args.name:
        for name in sorted(queries):
            print(name)
        return 0
    if args.name not in queries:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2
    spark = _session(args)
    df = queries[args.name](spark, args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


COMMANDS = {
    "index": cmd_index,
    "query": cmd_query,
    "embedding": cmd_embedding,
    "run": cmd_run,
}


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    return COMMANDS[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
