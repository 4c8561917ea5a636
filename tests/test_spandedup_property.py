"""Property-based invariants for the span-dedup and repo-pack twins
(hypothesis, pure Python — no Spark session).

The Spark ≡ twin parity tests cannot catch a rule that is wrong in BOTH
places, so this file pins the twins against independently-stated
invariants of the cut rule and the greedy packing rule, over randomized
inputs:

span-dedup:  the surviving text is a character-subsequence of the input;
             its (?i) token sequence is exactly the input's with the
             covered indices deleted (order preserved); untouched docs
             are byte-identical.
repo-pack:   token mass and file count are conserved; samples respect the
             budget unless a single file alone exceeds it; packing is
             greedily MAXIMAL (a new sample starts only because the next
             file would not fit); files pack in (path, doc_id) order.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginesimple_spark.config import TOKEN_RE
from searchenginesimple_spark.operators.repopack import pack_repo_samples_py
from searchenginesimple_spark.operators.spandedup import remove_clone_spans_py

_WORD = st.text(alphabet="abcxyz_01", min_size=1, max_size=4)
_SEP = st.sampled_from([" ", "\n", "  ", " + ", "(", ") ", "\t"])


@st.composite
def _doc(draw):
    n = draw(st.integers(0, 14))
    parts = []
    for _ in range(n):
        parts.append(draw(_SEP))
        parts.append(draw(_WORD))
    parts.append(draw(_SEP))
    return "".join(parts)


def _is_subsequence(small: str, big: str) -> bool:
    it = iter(big)
    return all(ch in it for ch in small)


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_span_cut_invariants(data):
    content = data.draw(_doc())
    pat = re.compile(TOKEN_RE, re.IGNORECASE)
    toks = pat.findall(content)
    n = len(toks)
    spans = []
    for _ in range(data.draw(st.integers(0, 4))):
        if n == 0:
            break
        s = data.draw(st.integers(0, n - 1))
        e = data.draw(st.integers(s, min(n - 1, s + 5)))
        spans.append((0, 1, "b", s, e))
    out = remove_clone_spans_py([(1, content)], spans)
    (doc_id, new, n_removed, n_spans) = out[0]
    assert doc_id == 1
    if not spans or n == 0:
        assert new == content and n_removed == 0
        return
    covered = {
        i for _, _, _, s, e in spans for i in range(s, e + 1) if i < n
    }
    # token sequence = input tokens minus covered indices, order preserved
    kept_tokens = [toks[i] for i in range(n) if i not in covered]
    assert pat.findall(new) == kept_tokens
    assert n_removed == len(covered)
    assert n_spans == len(set(spans))  # identical spans dedup (.distinct())
    # character-level: output is a subsequence of the input
    assert _is_subsequence(new, content)


@st.composite
def _repo_files(draw):
    n = draw(st.integers(1, 12))
    files = []
    for i in range(n):
        n_toks = draw(st.integers(0, 12))
        content = " ".join(f"t{i}_{j}" for j in range(n_toks))
        files.append((f"repo{i % 3}", f"f{i:02d}.py", i, content))
    return files


@settings(max_examples=150, deadline=None)
@given(_repo_files(), st.integers(1, 30))
def test_repo_pack_invariants(files, budget):
    out = pack_repo_samples_py(files, sample_tokens=budget)
    pat = re.compile(TOKEN_RE, re.IGNORECASE)
    tok_count = {
        (r, p): len(pat.findall(c)) for r, p, _, c in files
    }
    # conservation: every file in exactly one sample; token mass preserved
    assert sum(n_files for _, _, n_files, _, _ in out) == len(files)
    assert sum(n_tokens for _, _, _, n_tokens, _ in out) == sum(
        tok_count.values()
    )
    by_repo: dict[str, list] = {}
    for repo, sid, n_files, n_tokens, sample in out:
        by_repo.setdefault(repo, []).append((sid, n_files, n_tokens, sample))
    for repo, samples in by_repo.items():
        samples.sort()
        # sample ids are dense from 0
        assert [s[0] for s in samples] == list(range(len(samples)))
        repo_files = sorted(
            (p, d, tok_count[(repo, p)]) for r, p, d, _ in files if r == repo
        )
        idx = 0
        for k, (_, n_files, n_tokens, _) in enumerate(samples):
            members = repo_files[idx : idx + n_files]
            idx += n_files
            # budget holds unless ONE file carries all the (over-budget)
            # tokens — zero-token files may share its bin (fill was 0)
            nonzero = sum(1 for _, _, t in members if t > 0)
            assert n_tokens <= budget or nonzero == 1
            # greedy maximality: the next sample's first file wouldn't fit
            if k + 1 < len(samples):
                nxt = repo_files[idx][2]
                assert n_tokens + nxt > budget
