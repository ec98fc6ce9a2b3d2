"""End-to-end MCP stdio transport test (VERDICT round-1 "What's
missing" #1): a real client conversation — initialize handshake,
tools/list, tools/call for both tools, tool-level error wrapping, and
protocol-level errors — against the server running as a subprocess
over pipes, plus in-process protocol unit checks over StringIO.

The ``mcp`` package is absent from this container; the transport is
the hand-rolled newline-delimited JSON-RPC 2.0 in stdio.py, which is
exactly what MCP's stdio framing is.
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------- subprocess e2e


@pytest.fixture(scope="module")
def proc():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS="2",
        PYTHONPATH=str(REPO_ROOT),
    )
    p = subprocess.Popen(
        [sys.executable, "-m", "mcp_iceberg_duckdb_spark.stdio"],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        cwd=str(REPO_ROOT),
        text=True,
    )
    yield p
    p.stdin.close()
    p.wait(timeout=30)


def _rpc(p, method, params=None, req_id=None):
    msg = {"jsonrpc": "2.0", "method": method}
    if params is not None:
        msg["params"] = params
    if req_id is not None:
        msg["id"] = req_id
    p.stdin.write(json.dumps(msg) + "\n")
    p.stdin.flush()
    if req_id is None:
        return None
    line = p.stdout.readline()
    assert line, "server closed stdout"
    resp = json.loads(line)
    assert resp["id"] == req_id
    return resp


def test_stdio_full_conversation(proc):
    # 1. initialize handshake
    resp = _rpc(proc, "initialize", {"protocolVersion": "2024-11-05"}, 1)
    assert resp["result"]["protocolVersion"] == "2024-11-05"
    assert "tools" in resp["result"]["capabilities"]
    _rpc(proc, "notifications/initialized")

    # 2. tools/list
    resp = _rpc(proc, "tools/list", None, 2)
    names = {t["name"] for t in resp["result"]["tools"]}
    assert names == {
        "query_catalog",
        "query_table",
        "list_operators",
        "run_operator",
    }

    # 3. query_table over real data
    resp = _rpc(
        proc,
        "tools/call",
        {
            "name": "query_table",
            "arguments": {"query": "SELECT count(*) AS n FROM region"},
        },
        3,
    )
    result = resp["result"]
    assert not result["isError"]
    text = result["content"][0]["text"]
    assert text.startswith("Query execution time:")  # reference parity
    rows = json.loads(text.split("\n", 1)[1])
    assert rows == [{"n": 5}]

    # 4. query_catalog verb
    resp = _rpc(
        proc,
        "tools/call",
        {"name": "query_catalog", "arguments": {"query": "LIST TABLES"}},
        4,
    )
    assert not resp["result"]["isError"]

    # 5. tool-level error wrapped as content, not protocol error
    resp = _rpc(
        proc,
        "tools/call",
        {"name": "query_table", "arguments": {"query": "SELECT * FROM nope_t"}},
        5,
    )
    assert resp["result"]["isError"]
    assert "Error executing query" in resp["result"]["content"][0]["text"]

    # 6. protocol-level errors
    resp = _rpc(proc, "no/such/method", None, 6)
    assert resp["error"]["code"] == -32601
    resp = _rpc(
        proc, "tools/call", {"name": "nope", "arguments": {"query": "x"}}, 7
    )
    assert resp["error"]["code"] == -32602

    # 7. ping
    resp = _rpc(proc, "ping", None, 8)
    assert resp["result"] == {}

    # 8. list_operators exposes the registry inventory
    resp = _rpc(proc, "tools/call", {"name": "list_operators"}, 9)
    assert not resp["result"]["isError"]
    ops = json.loads(resp["result"]["content"][0]["text"].split("\n", 1)[1])
    op_names = {o["name"] for o in ops}
    assert {"q1_pricing_summary", "x_dedup_exact", "x_semdedup"} <= op_names
    assert all("tags" in o and "oracle_checked" in o for o in ops)

    # 9. run_operator executes a registered query end-to-end
    resp = _rpc(
        proc,
        "tools/call",
        {"name": "run_operator", "arguments": {"name": "q1_pricing_summary"}},
        10,
    )
    assert not resp["result"]["isError"]
    rows = json.loads(resp["result"]["content"][0]["text"].split("\n", 1)[1])
    assert rows and "sum_qty" in rows[0]

    # 10. unknown operator → tool-level error, missing arg → protocol error
    resp = _rpc(
        proc,
        "tools/call",
        {"name": "run_operator", "arguments": {"name": "nope_op"}},
        11,
    )
    assert resp["result"]["isError"]
    resp = _rpc(proc, "tools/call", {"name": "run_operator"}, 12)
    assert resp["error"]["code"] == -32602


# ------------------------------------------------------- in-process checks


def test_stdio_frames_are_single_lines_and_notifications_silent(spark):
    from mcp_iceberg_duckdb_spark.stdio import StdioServer

    out = io.StringIO()
    srv = StdioServer(spark, out=out)
    srv.handle_line('{"jsonrpc":"2.0","id":1,"method":"initialize"}')
    srv.handle_line('{"jsonrpc":"2.0","method":"notifications/initialized"}')
    srv.handle_line("this is not json")
    frames = out.getvalue().splitlines()
    # initialize response + parse error; NO frame for the notification
    assert len(frames) == 2
    for f in frames:
        json.loads(f)  # every stdout line is one valid JSON object
    assert json.loads(frames[1])["error"]["code"] == -32700
