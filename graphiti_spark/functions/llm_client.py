"""Remote-model client adapter for the Extractor seam (SURVEY §2.12).

The reference ships remote LLM clients with retry and caching behind
one interface — ``LLMClient.generate_response``
(llm_client/client.py:90-167, tenacity retry + in-memory cache),
``EmbedderClient`` (embedder/client.py:29-37) and the logprob
cross-encoder (cross_encoder/openai_reranker_client.py:61-118). This
repo's deterministic rule engine stands in for the model, but the
dataflow seam is the same: an ``Extractor`` is any pandas-batch →
pandas-batch callable (operators/extraction.py:34). This module proves
the seam carries a REAL remote model with NO plan change:
``RemoteTripleExtractor`` calls an HTTP endpoint from inside the
mapInPandas batch loop — batched, retrying with exponential backoff,
and disk-cached — so

    extract_triples(episodes, extractor=RemoteTripleExtractor(url))

runs the identical Spark plan with remote inference
(tests/test_remote_client.py drives it against a local stub server and
asserts row-for-row equality with the rule engine).

Design for the 1000-executor cluster:

- **Batched**: one HTTP call per ``batch_size`` UNIQUE (text,
  reference-time) prompts, not per row — the batch loop first dedups
  the Arrow batch (templated corpora are Zipf, same memoization as
  rules.extract_triples_pdf), so a 10⁴-row batch with 300 distinct
  texts costs ⌈300/batch_size⌉ requests.
- **Retrying**: bounded exponential backoff on connection errors,
  HTTP 429 and 5xx — the executor-side analog of the reference's
  tenacity policy. A request that exhausts retries raises, failing the
  Spark task so the normal task-retry/lineage machinery takes over
  (never silently drop extractions).
- **Disk-cached**: responses keyed by md5(model | text | ref-time)
  under ``cache_dir`` — task retries, speculative duplicates and
  re-runs of the same corpus hit the cache instead of the endpoint.
  The cache is one JSON file per key on a local/shared filesystem; at
  cluster scale point ``cache_dir`` at a shared mount, or swap the
  two functions ``_cache_get``/``_cache_put`` for a KV client — the
  seam is deliberately that narrow.
- **Picklable**: instances hold config only; the urllib opener is
  created lazily inside the worker process, so the object passes
  through the mapInPandas closure unchanged.
- **Concurrency**: parallelism is Spark's task count (the reference
  bounds LLM concurrency with an asyncio semaphore of 20,
  helpers.py:37; here the analogous knob is executor/task slots —
  cap with a dedicated small stage via repartition if the endpoint
  needs a global ceiling).

Wire protocol (the stub server in tests implements it; a production
adapter maps it onto a provider API inside ``_post``):

    POST {endpoint}  {"model": m, "episodes": [{"key", "text", "ref_time"}]}
    → 200 {"results": {key: [{"subj_name","pred","obj_name","fact",
                               "valid_at","invalid_at"}, ...]}}

timestamps as ISO-8601 strings or null.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import urllib.error
import urllib.request

import pandas as pd

from graphiti_spark import rules

# retry on these HTTP statuses (throttle + transient server errors)
_RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})


class RemoteTripleExtractor:
    """Extractor-protocol adapter calling a remote triple-extraction
    endpoint. ``__call__`` maps an episode batch (uuid, group_id, text,
    valid_at) to triple rows (rules._TRIPLE_COLS), exactly like
    rules.extract_triples_pdf — the two are interchangeable behind
    operators.extraction.extract_triples."""

    def __init__(
        self,
        endpoint: str,
        model: str = "stub-extractor",
        batch_size: int = 64,
        max_retries: int = 4,
        backoff_base: float = 0.1,
        timeout: float = 30.0,
        cache_dir: str | None = None,
    ) -> None:
        self.endpoint = endpoint
        self.model = model
        self.batch_size = int(batch_size)
        self.max_retries = int(max_retries)
        self.backoff_base = float(backoff_base)
        self.timeout = float(timeout)
        self.cache_dir = cache_dir

    # -- cache seam (swap these two for a KV client at cluster scale) --

    def _cache_path(self, key: str) -> str:
        return os.path.join(self.cache_dir, f"{key}.json")

    def _cache_get(self, key: str) -> list[dict] | None:
        if self.cache_dir is None:
            return None
        try:
            with open(self._cache_path(key)) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _cache_put(self, key: str, rows: list[dict]) -> None:
        if self.cache_dir is None:
            return
        os.makedirs(self.cache_dir, exist_ok=True)
        tmp = self._cache_path(key) + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(rows, f)
        os.replace(tmp, self._cache_path(key))  # atomic vs concurrent tasks

    # -- transport with bounded exponential-backoff retry --

    def _post(self, episodes: list[dict]) -> dict[str, list[dict]]:
        body = json.dumps({"model": self.model, "episodes": episodes}).encode()
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                time.sleep(self.backoff_base * (2 ** (attempt - 1)))
            try:
                req = urllib.request.Request(
                    self.endpoint, data=body,
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode())["results"]
            except urllib.error.HTTPError as e:
                last_err = e
                if e.code not in _RETRY_STATUSES:
                    raise
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last_err = e
        raise RuntimeError(
            f"extraction endpoint failed after {self.max_retries + 1} attempts: {last_err}"
        )

    # -- Extractor protocol --

    @staticmethod
    def _key_parts(text: str, ref_iso: str, model: str) -> str:
        return hashlib.md5(f"{model}|{ref_iso}|{text}".encode()).hexdigest()

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        cols = rules._TRIPLE_COLS
        if len(pdf) == 0:
            return pd.DataFrame(columns=cols)
        work = pdf[["uuid", "group_id"]].copy()
        work["text"] = pdf["text"].fillna("").astype(str)
        ref = pd.to_datetime(pdf["valid_at"])
        work["ref_iso"] = ref.map(lambda t: "" if pd.isna(t) else t.isoformat())
        work["key"] = [
            self._key_parts(t, r, self.model)
            for t, r in zip(work["text"], work["ref_iso"])
        ]
        # dedup prompts: one request row per unique (text, ref_time)
        uniq = work.drop_duplicates("key")[["key", "text", "ref_iso"]]
        results: dict[str, list[dict]] = {}
        missing: list[dict] = []
        for r in uniq.itertuples():
            cached = self._cache_get(r.key)
            if cached is not None:
                results[r.key] = cached
            else:
                missing.append({"key": r.key, "text": r.text, "ref_time": r.ref_iso})
        for i in range(0, len(missing), self.batch_size):
            chunk = missing[i : i + self.batch_size]
            got = self._post(chunk)
            for ep in chunk:
                rows = got.get(ep["key"], [])
                results[ep["key"]] = rows
                self._cache_put(ep["key"], rows)
        out_rows: list[dict] = []
        for r in work.itertuples():
            for t in results.get(r.key, []):
                out_rows.append(
                    {
                        "episode_uuid": r.uuid,
                        "group_id": r.group_id,
                        "subj_name": t["subj_name"],
                        "pred": t["pred"],
                        "obj_name": t["obj_name"],
                        "fact": t["fact"],
                        "valid_at": t.get("valid_at"),
                        "invalid_at": t.get("invalid_at"),
                    }
                )
        if not out_rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(out_rows)
        for c in ("valid_at", "invalid_at"):
            out[c] = pd.to_datetime(out[c])
        return out[cols]
