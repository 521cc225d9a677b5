"""Remote-client adapter behind the Extractor seam (SURVEY §2.12).

Proves the "prompts are the contract" seam carries a real remote model
without plan changes (VERDICT r4 #6): a stub HTTP endpoint implements
the wire protocol of graphiti_spark.functions.llm_client, and
`extract_triples(episodes, extractor=RemoteTripleExtractor(url))`
must produce row-for-row the same triples as the in-process rule
engine, through the SAME mapInPandas plan. Batching, retry-with-
backoff and the disk cache are asserted against server-side counters.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from graphiti_spark import rules, transcripts
from graphiti_spark.functions.llm_client import RemoteTripleExtractor
from graphiti_spark.operators import episodes as ep_ops
from graphiti_spark.operators import extraction


class _StubState:
    """Shared mutable state the tests poke: request/episode counters
    and a number of requests to fail with 500 before succeeding."""

    def __init__(self) -> None:
        self.n_requests = 0
        self.n_episodes = 0
        self.fail_next = 0
        self.lock = threading.Lock()


def _make_handler(state: _StubState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            with state.lock:
                state.n_requests += 1
                if state.fail_next > 0:
                    state.fail_next -= 1
                    self.send_response(500)
                    self.end_headers()
                    return
                state.n_episodes += len(body["episodes"])
            # the "model": the same extraction semantics as the rule
            # engine, reached over the wire — what a provider adapter
            # would return for the extraction prompt
            eps = pd.DataFrame(
                {
                    "uuid": [e["key"] for e in body["episodes"]],
                    "group_id": "",
                    "text": [e["text"] for e in body["episodes"]],
                    "valid_at": pd.to_datetime(
                        [e["ref_time"] or None for e in body["episodes"]]
                    ),
                }
            )
            tri = rules.extract_triples_pdf(eps)
            results = {e["key"]: [] for e in body["episodes"]}
            for r in tri.itertuples():
                results[r.episode_uuid].append(
                    {
                        "subj_name": r.subj_name,
                        "pred": r.pred,
                        "obj_name": r.obj_name,
                        "fact": r.fact,
                        "valid_at": None if pd.isna(r.valid_at) else r.valid_at.isoformat(),
                        "invalid_at": None if pd.isna(r.invalid_at) else r.invalid_at.isoformat(),
                    }
                )
            payload = json.dumps({"results": results}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    return Handler


@pytest.fixture()
def stub_server():
    state = _StubState()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/extract", state
    srv.shutdown()


def test_remote_extractor_matches_rules_through_spark(spark, stub_server, tmp_path):
    """The full Spark plan with the remote extractor equals the rule
    engine row-for-row — the seam carries a remote model unchanged."""
    url, state = stub_server
    t = transcripts.synthesize_transcripts(spark, n_convs=6, turns_per_conv=8)
    eps = ep_ops.build_episodes(t)
    local = (
        extraction.extract_triples(eps)
        .toPandas()
        .sort_values(["episode_uuid", "subj_name", "pred", "obj_name"])
        .reset_index(drop=True)
    )
    remote_ex = RemoteTripleExtractor(url, cache_dir=str(tmp_path / "cache"))
    remote = (
        extraction.extract_triples(eps, extractor=remote_ex)
        .toPandas()
        .sort_values(["episode_uuid", "subj_name", "pred", "obj_name"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, remote)
    assert state.n_requests > 0


def test_remote_extractor_batches_retries_and_caches(stub_server, tmp_path):
    """Direct (no-Spark) contract checks: ⌈unique/batch_size⌉ requests,
    500s are retried with backoff until success, and a second pass over
    the same prompts is served entirely from the disk cache."""
    url, state = stub_server
    ref = pd.Timestamp("2025-01-01 00:00:00")
    n = 10
    pdf = pd.DataFrame(
        {
            "uuid": [f"ep{i}" for i in range(n)],
            "group_id": "g",
            # 5 unique texts, each appearing twice → prompt dedup
            "text": [
                f"{name} works at Acme."
                for name in ["Alice", "Bob", "Carol", "Dave", "Erin"]
            ] * 2,
            "valid_at": [ref] * n,
        }
    )
    ex = RemoteTripleExtractor(
        url, batch_size=2, backoff_base=0.01, cache_dir=str(tmp_path / "cache")
    )
    state.fail_next = 2  # first two requests 500 → must retry
    out = ex(pdf)
    assert len(out) == n  # every episode extracted (one triple each)
    assert list(out.columns) == rules._TRIPLE_COLS
    # 5 unique prompts / batch_size 2 = 3 successful requests + 2 failed
    assert state.n_requests == 5
    assert state.n_episodes == 5  # unique prompts only, never all 10
    # second pass: all cached, endpoint untouched
    before = state.n_requests
    out2 = ex(pdf)
    assert state.n_requests == before
    pd.testing.assert_frame_equal(out, out2)


def test_remote_extractor_raises_after_retry_budget(stub_server, tmp_path):
    """Exhausted retries raise (failing the Spark task → task-level
    retry), never silently drop extractions."""
    url, state = stub_server
    ex = RemoteTripleExtractor(
        url, max_retries=1, backoff_base=0.01, cache_dir=str(tmp_path / "cache")
    )
    state.fail_next = 10
    pdf = pd.DataFrame(
        {
            "uuid": ["e0"],
            "group_id": "g",
            "text": ["Bob works at Globex."],
            "valid_at": [pd.Timestamp("2025-01-01")],
        }
    )
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        ex(pdf)
