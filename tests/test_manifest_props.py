"""Property tests for the incremental manifest (no Spark needed — the
manifest reads only file names/sizes, so random append/rewrite/delete
histories can be driven straight on the filesystem).

Invariants under ANY history of appends, rewrites, and deletes:

1. file→batch membership is assigned once and never moves;
2. a FULL batch whose members are untouched since the last refresh
   keeps its snapshot token; any member change flips it;
3. tokens are consistent: two batches with identical (name, size)
   member lists would collide only by md5-collision, and refreshing
   twice with no filesystem change is a no-op.
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings, strategies as st

from sparkjesse import sources

K = 3  # files_per_batch — small so histories cross batch boundaries

# a history step: ("append",) | ("rewrite", victim_idx) | ("delete", victim_idx)
step = st.one_of(
    st.tuples(st.just("append")),
    st.tuples(st.just("rewrite"), st.integers(0, 30)),
    st.tuples(st.just("delete"), st.integers(0, 30)),
)


def _apply(root: str, counter: list[int], names: list[str], op) -> None:
    if op[0] == "append":
        name = f"part-{counter[0]:04d}.parquet"
        counter[0] += 1
        with open(os.path.join(root, name), "wb") as fh:
            fh.write(b"x" * (10 + counter[0]))
        names.append(name)
    elif names:
        victim = names[op[1] % len(names)]
        full = os.path.join(root, victim)
        if op[0] == "rewrite" and os.path.exists(full):
            with open(full, "ab") as fh:
                fh.write(b"y" * 7)  # size change
        elif op[0] == "delete" and os.path.exists(full):
            os.remove(full)


@settings(max_examples=60, deadline=None)
@given(history=st.lists(st.lists(step, min_size=0, max_size=4),
                        min_size=1, max_size=6))
def test_manifest_invariants(tmp_path_factory, history):
    root = str(tmp_path_factory.mktemp("mf"))
    data = os.path.join(root, "docs")
    os.makedirs(data)
    mf = os.path.join(root, "manifest.json")
    counter, names = [0], []

    # seed with one full batch so invariant 2 has a stable subject
    for _ in range(K):
        _apply(data, counter, names, ("append",))

    prev_positions: dict[str, int] = {}
    prev_tokens: dict[str, str] = {}
    prev_members: dict[str, tuple] = {}
    for epoch in history:
        for op in epoch:
            _apply(data, counter, names, op)
        m = sources.refresh_manifest(data, mf, files_per_batch=K)

        # (1) membership never moves
        positions = {f["name"]: i for i, f in enumerate(m["files"])}
        for name, pos in prev_positions.items():
            assert positions[name] == pos, "file changed batch position"
        prev_positions = positions

        # (3) double refresh with no change is a no-op
        m2 = sources.refresh_manifest(data, mf)
        assert m2 == m
        with open(mf, encoding="utf-8") as fh:
            assert json.load(fh) == m

        # (2) token flips iff the batch's member (name,size) list changed
        members: dict[str, tuple] = {}
        for i in range(0, len(m["files"]), K):
            pid = f"batch-{i // K:05d}"
            members[pid] = tuple((f["name"], f["size"])
                                 for f in m["files"][i:i + K])
        tokens = dict(sources.manifest_partitions(m))
        for pid, tok in prev_tokens.items():
            if prev_members[pid] == members.get(pid):
                assert tokens[pid] == tok, f"{pid}: token flipped untouched"
            else:
                assert tokens[pid] != tok, f"{pid}: change kept stale token"
        prev_tokens, prev_members = tokens, members

        # live files on disk == manifest entries with size >= 0
        on_disk = {n for n in os.listdir(data) if n.endswith(".parquet")}
        assert {f["name"] for f in m["files"] if f["size"] >= 0} == on_disk
