"""CLI surface tests (cli_rag_spark/cli.py) — the engine analog of the
reference's binaries, driven in-process (the session fixture is
reused via getOrCreate)."""

from __future__ import annotations

import json
import os

import pytest

from cli_rag_spark.cli import main

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def built_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "index.parquet")
    vdb = str(tmp_path_factory.mktemp("cli") / "index.vdb")
    rc = main(
        [
            "index",
            f"{SF_SMOKE}/documents.parquet",
            "--chunk-size",
            "200",
            "--dim",
            "16",
            "--out",
            out,
            "--vdb",
            vdb,
        ]
    )
    assert rc == 0
    return out, vdb


def test_index_and_query_parquet(built_index, capsys):
    out, _ = built_index
    rc = main(["query", out, "--text", "hello world", "-k", "3", "--dim", "16"])
    captured = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in captured.strip().splitlines() if l.startswith("#")]
    assert len(lines) == 3
    assert lines[0].startswith("#1")
    assert "dist=" in lines[0]


def test_query_vdb_matches_parquet(built_index, capsys):
    """The .vdb export answers the same query with the same ranking."""
    out, vdb = built_index
    assert os.path.getsize(vdb) > 21
    main(["query", out, "--text", "abc", "-k", "3", "--dim", "16"])
    a = [l for l in capsys.readouterr().out.splitlines() if l.startswith("#")]
    main(["query", vdb, "--text", "abc", "-k", "3", "--dim", "16"])
    b = [l for l in capsys.readouterr().out.splitlines() if l.startswith("#")]
    assert [l.split("  ")[:3] for l in a] == [l.split("  ")[:3] for l in b]


def test_query_prompt_assembly(built_index, capsys):
    out, _ = built_index
    rc = main(["query", out, "--text", "what?", "-k", "2", "--dim", "16", "--show-prompt"])
    captured = capsys.readouterr().out
    assert rc == 0
    assert "Context 1:" in captured
    assert "<|start_header_id|>assistant<|end_header_id|>" in captured
    assert "assistent" not in captured  # reference typo not inherited (multirag.c:77)


def test_embedding_command(capsys):
    rc = main(["embedding", "--text", "abc", "--dim", "8"])
    vec = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert len(vec) == 8
    assert abs(sum(x * x for x in vec) - 1.0) < 1e-6


def test_run_list_and_exec(capsys):
    rc = main(["run", "--list"])
    names = capsys.readouterr().out.split()
    assert rc == 0
    assert "cosine_topk" in names
    rc = main(["run", "cosine_topk", "--sf-dir", SF_SMOKE])
    assert rc == 0
    assert "dist" in capsys.readouterr().out


def test_run_unknown_query(capsys):
    assert main(["run", "nope"]) == 2


def test_query_k_too_large(built_index):
    out, _ = built_index
    with pytest.raises(Exception, match="entries but"):
        main(["query", out, "--text", "x", "-k", "10000000", "--dim", "16"])


def test_http_embedder_stub_server(spark):
    """Exercises the llama.cpp /embedding contract
    (embedding-from-server.c:66-88) against a local stub server."""
    import http.server
    import threading

    from cli_rag_spark.operators.embed import embed, http_embed_one

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            body = json.loads(self.rfile.read(n))
            text = body["content"]
            vec = [float(len(text)), 1.0, 2.0, 3.0]
            resp = json.dumps([{"embedding": [vec]}]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        assert http_embed_one("abcde", "127.0.0.1", port) == [5.0, 1.0, 2.0, 3.0]
        df = spark.createDataFrame([("hi",), ("worlds",)], ["chunk_text"])
        rows = {
            r["chunk_text"]: r["embedding"]
            for r in embed(df, mode="http", host="127.0.0.1", port=port).collect()
        }
        assert rows["hi"][0] == 2.0
        assert rows["worlds"][0] == 6.0
    finally:
        srv.shutdown()


def test_index_jsonl_corpus(spark, tmp_path, capsys):
    """jsonl (LLM-pipeline interchange) in, parquet index out."""
    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"text": "alpha beta gamma delta epsilon"}\n'
        '{"text": "one two three four five six seven"}\n'
    )
    out = str(tmp_path / "idx")
    rc = main(["index", str(src), "--format", "jsonl", "--chunk-size", "10",
               "--dim", "8", "--out", out])
    assert rc == 0
    idx = spark.read.parquet(out)
    assert idx.count() > 2  # chunked into multiple rows
    assert {"doc_id", "chunk_text", "embedding"} <= set(idx.columns)
