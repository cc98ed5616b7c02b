"""Hierarchical tag completion for partially-tagged corpora.

Parity: reference data/chat_with_llm.py (OpenAI-compatible Qwen model pool,
thread-safe round-robin / least-used selection, retries, JSON parsing,
ThreadPoolExecutor batching), data/fill_kuairand.py (LLM-prompted completion
over cosine-retrieved candidates) and data/fill_kuairand_simple.py (the
deterministic LLM-free fallback: L1->L2->L3 parent-child hierarchy from
observed co-occurrence, completion by cosine retrieval constrained to the
parent's children, with context embeddings mixing item + parent tags at the
reference's 0.6/0.4 and 0.5/0.3/0.2 weights).

This environment has no network egress: `LLMPool` raises a clear error at call
time unless endpoints are configured, and `complete_tags_hierarchical` (the
deterministic route) is the default. The math here is vectorized numpy — the
reference loops per item per candidate tag (fill_kuairand_simple.py:180-216).
"""

import json
import logging
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger("hidvae_tpu.data.llm_tags")


# ---------------------------------------------------------------- LLM pool


@dataclass
class LLMEndpoint:
    base_url: str
    api_key: str = "EMPTY"
    model: str = "qwen"
    in_flight: int = 0


class LLMPool:
    """Thread-safe OpenAI-compatible endpoint pool
    (ref chat_with_llm.py:59-108, 302-341)."""

    def __init__(self, endpoints: Sequence[LLMEndpoint], *, strategy: str = "least_used",
                 max_retries: int = 3, retry_delay: float = 1.0):
        if not endpoints:
            raise ValueError(
                "LLMPool needs at least one endpoint; this environment has no "
                "network egress — use complete_tags_hierarchical (the "
                "deterministic route) instead."
            )
        self.endpoints = list(endpoints)
        self.strategy = strategy
        self.max_retries = max_retries
        self.retry_delay = retry_delay
        self._lock = threading.Lock()
        self._rr = 0

    def _pick(self) -> LLMEndpoint:
        with self._lock:
            if self.strategy == "round_robin":
                ep = self.endpoints[self._rr % len(self.endpoints)]
                self._rr += 1
            else:  # least_used
                ep = min(self.endpoints, key=lambda e: e.in_flight)
            ep.in_flight += 1
            return ep

    def _release(self, ep: LLMEndpoint):
        with self._lock:
            ep.in_flight = max(0, ep.in_flight - 1)

    def chat(self, messages: List[dict], *, temperature: float = 0.2,
             parse_json: bool = True):
        """One chat completion with retries + optional JSON extraction
        (ref chat_with_llm.py:150-300)."""
        import urllib.request

        last_err = None
        for attempt in range(self.max_retries):
            ep = self._pick()
            try:
                body = json.dumps({
                    "model": ep.model,
                    "messages": messages,
                    "temperature": temperature,
                }).encode()
                req = urllib.request.Request(
                    ep.base_url.rstrip("/") + "/chat/completions",
                    data=body,
                    headers={"Content-Type": "application/json",
                             "Authorization": f"Bearer {ep.api_key}"},
                )
                with urllib.request.urlopen(req, timeout=120) as resp:
                    out = json.loads(resp.read())
                text = out["choices"][0]["message"]["content"]
                return _extract_json(text) if parse_json else text
            except Exception as e:  # noqa: BLE001 — retry any transport error
                last_err = e
                logger.warning(f"LLM call failed (attempt {attempt + 1}): {e}")
                time.sleep(self.retry_delay * (attempt + 1))
            finally:
                self._release(ep)
        raise RuntimeError(f"LLM pool exhausted retries: {last_err}")

    def chat_batch(self, message_lists: List[List[dict]], *, max_workers: int = 8,
                   **kw):
        """Parallel batch of chat calls (ref chat_with_llm.py:302-341)."""
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            futures = [ex.submit(self.chat, m, **kw) for m in message_lists]
            return [f.result() for f in futures]


def _extract_json(text: str):
    """Pull the first JSON object out of a model reply (ref chat_with_llm.py
    JSON-parsing helpers)."""
    start = text.find("{")
    end = text.rfind("}")
    if start == -1 or end == -1:
        raise ValueError(f"No JSON object in LLM reply: {text[:200]!r}")
    return json.loads(text[start : end + 1])


# ------------------------------------------------- deterministic completion


def build_tag_hierarchy(tags_indices: np.ndarray) -> Dict[str, Dict[int, List[int]]]:
    """Parent->children maps from observed co-occurrence
    (ref fill_kuairand_simple.py:21-55)."""
    l1_to_l2: Dict[int, set] = {}
    l2_to_l3: Dict[int, set] = {}
    for l1, l2, l3 in np.asarray(tags_indices):
        if l1 != -1 and l2 != -1:
            l1_to_l2.setdefault(int(l1), set()).add(int(l2))
        if l2 != -1 and l3 != -1:
            l2_to_l3.setdefault(int(l2), set()).add(int(l3))
    return {
        "l1_to_l2": {k: sorted(v) for k, v in l1_to_l2.items()},
        "l2_to_l3": {k: sorted(v) for k, v in l2_to_l3.items()},
    }


def build_tag_pools(tags_indices: np.ndarray, tags_emb: np.ndarray):
    """Per-level mean tag embeddings over items carrying the tag
    (ref fill_kuairand.py:330+ / fill_kuairand_simple.create_tag_pools).
    Returns per level: (ids [K_l], embeddings [K_l, D] unit-norm)."""
    n_levels = tags_indices.shape[1]
    pools = []
    for level in range(n_levels):
        ids = np.unique(tags_indices[:, level])
        ids = ids[ids >= 0]
        embs = np.zeros((len(ids), tags_emb.shape[-1]), np.float32)
        for j, tag in enumerate(ids):
            mask = tags_indices[:, level] == tag
            embs[j] = tags_emb[mask, level].mean(axis=0)
        norms = np.linalg.norm(embs, axis=-1, keepdims=True)
        embs /= np.maximum(norms, 1e-8)
        pools.append((ids.astype(np.int32), embs))
    return pools


def _retrieve(context, pool_ids, pool_embs, candidates: Optional[List[int]]):
    """Most-cosine-similar tag, optionally constrained to candidate ids
    (ref fill_kuairand_simple.py:180-216), vectorized."""
    c = context / max(np.linalg.norm(context), 1e-8)
    if candidates is not None:
        mask = np.isin(pool_ids, candidates)
        if not mask.any():
            return None, None
        ids, embs = pool_ids[mask], pool_embs[mask]
    else:
        ids, embs = pool_ids, pool_embs
    sims = embs @ c
    j = int(np.argmax(sims))
    return int(ids[j]), embs[j]


def complete_tags_hierarchical(
    item_features: np.ndarray,
    tags_indices: np.ndarray,
    tags_emb: np.ndarray,
) -> np.ndarray:
    """Fill -1 tag slots level-by-level under hierarchy constraints
    (ref fill_kuairand_simple.py:218-325). Returns completed tags_indices.

    L1: global cosine retrieval from the item embedding.
    L2: retrieval among the L1 parent's children, context = 0.6*L1 + 0.4*item.
    L3: retrieval among the L2 parent's children,
        context = 0.5*L2 + 0.3*L1 + 0.2*item. Empty candidate sets fall back
        to a global per-level search.
    """
    tags = np.asarray(tags_indices).copy()
    hierarchy = build_tag_hierarchy(tags)
    pools = build_tag_pools(tags, tags_emb)
    pool_lookup = [
        {int(t): pools[l][1][j] for j, t in enumerate(pools[l][0])}
        for l in range(len(pools))
    ]

    for i in range(len(tags)):
        if (tags[i] != -1).all():
            continue
        item_emb = item_features[i]
        item_emb = item_emb / max(np.linalg.norm(item_emb), 1e-8)
        lvl_emb = {}
        for l in range(3):
            if tags[i, l] != -1:
                e = tags_emb[i, l]
                lvl_emb[l] = e / max(np.linalg.norm(e), 1e-8)

        if tags[i, 0] == -1:
            tid, emb = _retrieve(item_emb, *pools[0], None)
            if tid is not None:
                tags[i, 0] = tid
                lvl_emb[0] = emb

        if tags[i, 1] == -1 and tags[i, 0] != -1:
            candidates = hierarchy["l1_to_l2"].get(int(tags[i, 0]))
            l1e = lvl_emb.get(0, item_emb)
            context = 0.6 * l1e + 0.4 * item_emb
            tid, emb = _retrieve(context, *pools[1], candidates)
            if tid is None:
                tid, emb = _retrieve(context, *pools[1], None)
            if tid is not None:
                tags[i, 1] = tid
                lvl_emb[1] = emb

        if tags[i, 2] == -1 and tags[i, 1] != -1:
            candidates = hierarchy["l2_to_l3"].get(int(tags[i, 1]))
            l1e = lvl_emb.get(0, item_emb)
            l2e = lvl_emb.get(1, item_emb)
            context = 0.5 * l2e + 0.3 * l1e + 0.2 * item_emb
            tid, emb = _retrieve(context, *pools[2], candidates)
            if tid is None:
                tid, emb = _retrieve(context, *pools[2], None)
            if tid is not None:
                tags[i, 2] = tid

    return tags


def completion_prompt(item_text: str, known_tags: Dict[int, str],
                      candidates: Dict[int, List[str]]) -> List[dict]:
    """Structured JSON completion prompt (ref fill_kuairand.py:433-517 intent)."""
    payload = {
        "item": item_text,
        "known_tags": {f"level_{k + 1}": v for k, v in known_tags.items()},
        "candidates": {f"level_{k + 1}": v for k, v in candidates.items()},
        "instruction": (
            "Pick the best tag for each missing level from the candidates. "
            'Reply with JSON: {"level_1": ..., "level_2": ..., "level_3": ...}'
        ),
    }
    return [
        {"role": "system",
         "content": "You complete hierarchical category tags for short-video items."},
        {"role": "user", "content": json.dumps(payload, ensure_ascii=False)},
    ]


def load_completion_progress(progress_path: str) -> Dict[int, List[int]]:
    """Read a partial-completion journal written by `complete_tags_llm`
    (ref fill_kuairand.py:834-1209 persists partial completions the same way:
    append-only records keyed by item row, re-read on restart)."""
    done: Dict[int, List[int]] = {}
    if not os.path.exists(progress_path):
        return done
    with open(progress_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
                done[int(rec["row"])] = [int(t) for t in rec["tags"]]
            except (ValueError, KeyError, TypeError):
                # A torn or malformed record (truncated JSON, missing key, or
                # a null/non-iterable "tags") from a crash mid-write is
                # expected; skip it.
                logger.warning(f"skipping torn progress record: {line[:80]!r}")
    return done


def complete_tags_llm(
    pool: LLMPool,
    item_texts: Sequence[str],
    tags_indices: np.ndarray,
    vocabs: Sequence[Sequence[str]],
    tags_emb: np.ndarray,
    item_features: np.ndarray,
    *,
    top_k_candidates: int = 10,
    max_workers: int = 8,
    progress_path: Optional[str] = None,
) -> np.ndarray:
    """LLM-assisted completion: cosine-retrieved top-k candidates per missing
    level, structured JSON prompt, answers mapped back to ids; rows the LLM
    fails on fall back to the deterministic route (ref fill_kuairand.py
    pipeline shape).

    With `progress_path`, every completed row is journaled (append-only jsonl,
    flushed per row) as soon as its reply lands, and a restarted run replays
    the journal and only queries the remaining rows — the reference checkpoints
    its completion progress the same way (ref fill_kuairand.py:834-1209). A
    crash (process kill, endpoint death past retries) therefore loses at most
    the in-flight requests, never completed work.
    """
    tags = np.asarray(tags_indices).copy()

    done = load_completion_progress(progress_path) if progress_path else {}
    for i, row_tags in done.items():
        if 0 <= i < len(tags):
            tags[i] = row_tags
    if done:
        logger.info(
            f"resuming LLM tag completion: {len(done)} rows already journaled "
            f"at {progress_path}"
        )

    pools = build_tag_pools(tags, tags_emb)
    needs = [
        int(i) for i in np.nonzero((tags == -1).any(axis=1))[0] if int(i) not in done
    ]
    prompts = {}
    for i in needs:
        known = {l: vocabs[l][tags[i, l]] for l in range(3) if tags[i, l] != -1}
        cands = {}
        item_emb = item_features[i] / max(np.linalg.norm(item_features[i]), 1e-8)
        for l in range(3):
            if tags[i, l] == -1:
                ids, embs = pools[l]
                sims = embs @ item_emb
                top = ids[np.argsort(-sims)[:top_k_candidates]]
                cands[l] = [vocabs[l][t] for t in top]
        prompts[i] = completion_prompt(item_texts[i], known, cands)

    lookup = [{t: j for j, t in enumerate(v)} for v in vocabs]
    journal = open(progress_path, "a") if progress_path else None
    journal_lock = threading.Lock()
    try:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            futures = {ex.submit(pool.chat, p): i for i, p in prompts.items()}
            for fut in as_completed(futures):
                i = futures[fut]
                try:
                    reply = fut.result()
                    for l in range(3):
                        if tags[i, l] == -1:
                            name = reply.get(f"level_{l + 1}")
                            if name in lookup[l]:
                                tags[i, l] = lookup[l][name]
                except Exception as e:  # noqa: BLE001 — row falls to the
                    # deterministic route below; the run itself survives.
                    logger.warning(f"LLM completion failed for row {i}: {e}")
                    continue
                if journal is not None:
                    with journal_lock:
                        journal.write(json.dumps(
                            {"row": i, "tags": [int(t) for t in tags[i]]}
                        ) + "\n")
                        journal.flush()
    finally:
        if journal is not None:
            journal.close()

    if (tags == -1).any():
        tags = complete_tags_hierarchical(item_features, tags, tags_emb)
    return tags


def fill_empty_titles(
    item_texts: Sequence[str],
    tags_indices: np.ndarray,
    vocabs: Sequence[Sequence[str]],
) -> List[str]:
    """Fill empty/whitespace-only item titles with the item's valid tag names
    joined by spaces (ref fill_kuairand_simple.py:688-744 `fill_empty_titles`
    — it joins the item's non-empty tag strings as the new title). Items whose
    tags are all missing keep their (empty) title, as in the reference.

    Returns a new list; the input is not mutated."""
    out = list(item_texts)
    filled = 0
    for i, text in enumerate(out):
        if text is not None and str(text).strip():
            continue
        names = [
            vocabs[l][t]
            for l, t in enumerate(tags_indices[i])
            if 0 <= int(t) < len(vocabs[l]) and str(vocabs[l][t]).strip()
        ]
        if names:
            out[i] = " ".join(names)
            filled += 1
    logger.info(
        f"fill_empty_titles: filled {filled} empty titles "
        f"out of {len(out)} items"
    )
    return out
