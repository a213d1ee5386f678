"""Property-based tests (hypothesis) for the pure scalar cores — the
invariants the Spark operators rely on, independent of any fixture."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from contacts_etl_phase21_spark.functions.merge_core import (
    DedupeConfig, merge_cluster, pair_signals,
)
from contacts_etl_phase21_spark.functions.phones import (
    phone_to_e164, render_with_extension,
)
from contacts_etl_phase21_spark.functions.record_norm import (
    normalize_emails, normalize_phones,
)
from contacts_etl_phase21_spark.functions.similarity import (
    jaccard, minhash_signature, seq_ratio,
)
from contacts_etl_phase21_spark.functions.text import fold_text

text = st.text(max_size=40)
name = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Zs")),
    max_size=25)


@given(text)
def test_fold_text_idempotent_mod_strip(s):
    # parity note: like the reference's _norm (normalization.py:241-247),
    # fold_text can emit a bare space for whitespace-decomposing chars
    # ('¸' → NFKD space + combining cedilla); refolding strips it. The
    # invariant the engine relies on is stability modulo that strip.
    assert fold_text(fold_text(s)) == fold_text(s).strip()


@given(text, text)
def test_seq_ratio_difflib_parity_and_bounded(a, b):
    # The contract is EXACT stdlib-difflib parity (the reference scores
    # with SequenceMatcher, normalization.py:392-393) — NOT symmetry:
    # ratio() is order-dependent (greedy matching + b2j; e.g.
    # ratio('020','210')=1/3 but 2/3 reversed; same for 'baõ'/'õbõ'),
    # and the engine deliberately preserves ingest orientation via rid
    # ordering. Hypothesis found the digit example in round 4; the
    # old symmetry assertion was wrong, not the function.
    from difflib import SequenceMatcher

    r = seq_ratio(a, b)
    assert 0.0 <= r <= 1.0
    # seq_ratio lowercases both sides first (reference semantics)
    la, lb = a.lower(), b.lower()
    assert r == SequenceMatcher(None, la, lb).ratio()
    assert seq_ratio(b, a) == SequenceMatcher(None, lb, la).ratio()
    assert seq_ratio(a, a) == 1.0


@given(st.text(alphabet="0123456789 ()+-.", max_size=20))
def test_phone_e164_stable_when_valid(raw):
    from contacts_etl_phase21_spark.functions.phones import phone_is_valid

    once = phone_to_e164(raw)
    # the pipeline re-formats already-normalized numbers during cluster
    # merge (reference does too); VALID numbers must be fixpoints —
    # invalid ones go down the non-standard path instead.
    if once and phone_is_valid(once):
        assert phone_to_e164(once) == once


@given(st.lists(st.tuples(st.emails(), st.sampled_from(
    ["", "home", "work", "other", "invalid"])), max_size=8))
def test_normalize_emails_no_value_dupes(entries):
    out, _ = normalize_emails(
        [{"value": v, "label": l} for v, l in entries])
    values = [e["value"] for e in out]
    assert len(values) == len(set(values))


@given(st.lists(st.tuples(
    st.text(alphabet="0123456789", min_size=10, max_size=10),
    st.sampled_from(["", "mobile", "work"])), max_size=6))
def test_normalize_phones_no_key_dupes(entries):
    out, _ = normalize_phones(
        [{"value": v, "label": l, "extension": ""} for v, l in entries])
    keys = [(p["value"], p["extension"]) for p in out]
    assert len(keys) == len(set(keys))


@settings(max_examples=25)
@given(st.sets(st.text(min_size=1, max_size=12), min_size=1, max_size=60),
       st.sets(st.text(min_size=1, max_size=12), min_size=1, max_size=60))
def test_minhash_estimates_jaccard(a, b):
    sig_a, sig_b = minhash_signature(a, 128), minhash_signature(b, 128)
    est = sum(x == y for x, y in zip(sig_a, sig_b)) / 128
    assert abs(est - jaccard(a, b)) < 0.35  # 128 hashes → loose bound


@given(name, name)
def test_pair_signals_symmetric(first_a, first_b):
    a = {"first_name": first_a, "last_name": "X", "emails": [],
         "phones": [], "addresses": []}
    b = {"first_name": first_b, "last_name": "X", "emails": [],
         "phones": [], "addresses": []}
    sa, sb = pair_signals(a, b), pair_signals(b, a)
    # difflib's ratio is ORDER-DEPENDENT (SequenceMatcher's b2j/junk
    # heuristics; e.g. ratio('baõ','õbõ') = 2/3 but 1/3 reversed), and
    # the reference inherits that (normalization.py:392-393), always
    # scoring pairs in ingest orientation (combine_contacts.py:
    # 1149-1152) — which we mirror via rid ordering. So only the
    # NON-name evidence is symmetric; the name term is exempt.
    ev_a = sa.score - 0.7 * sa.first_similarity
    ev_b = sb.score - 0.7 * sb.first_similarity
    assert abs(ev_a - ev_b) < 1e-9
    assert sa.corroborators == sb.corroborators


@given(st.lists(st.fixed_dictionaries({
    "source": st.sampled_from(["gmail", "linkedin", "mac_vcf"]),
    "source_row_id": st.integers(0, 99).map(str),
    "first_name": name, "last_name": name,
}), min_size=1, max_size=5))
def test_merge_cluster_total_and_deterministic(records):
    for r in records:
        r.setdefault("emails", [])
        r.setdefault("phones", [])
        r.setdefault("addresses", [])
    m1 = merge_cluster([dict(r) for r in records])
    m2 = merge_cluster([dict(r) for r in records])
    assert m1 == m2  # deterministic
    assert m1["source_row_count"] == len(records)
    assert 0 <= len(m1["contact_id"]) == 36  # uuid shape


@given(st.text(alphabet="0123456789+", min_size=1, max_size=14),
       st.text(alphabet="0123456789", max_size=4))
def test_render_with_extension_roundtrip(value, ext):
    rendered = render_with_extension(value, ext)
    assert rendered.startswith(value)
    if ext:
        assert rendered.endswith(ext)


def test_merge_gates_never_accept_empty_pair():
    empty = {"first_name": "", "last_name": "", "emails": [], "phones": [],
             "addresses": []}
    sig = pair_signals(empty, empty)
    assert not __import__(
        "contacts_etl_phase21_spark.functions.merge_core",
        fromlist=["merge_ok"]).merge_ok(empty, empty, sig, DedupeConfig())


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.text(alphabet="ab c", min_size=1, max_size=8),
              st.integers(min_value=1, max_value=9)),
    min_size=1, max_size=12),
    st.integers(min_value=1, max_value=20))
def test_bpe_incremental_equals_recount(word_counts, n_merges):
    # the incremental pair-count deltas (only affected words rewritten)
    # must match a full recount-from-scratch at every merge — tiny
    # alphabet with repeats + spaces inside "words" maximizes
    # overlapping-run and tie pressure
    from collections import Counter

    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        bpe_merges_local,
    )

    # dedupe words (the trainer's input is a frequency TABLE)
    seen = {}
    for w, c in word_counts:
        seen[w] = seen.get(w, 0) + c
    wc = sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))

    def recount(word_counts, n):
        words = [list(w) for w, _ in word_counts]
        freqs = [c for _, c in word_counts]
        out = []
        for rank in range(1, n + 1):
            pc = Counter()
            for syms, f in zip(words, freqs):
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += f
            if not pc:
                break
            best = max(pc.values())
            left, right = min(p for p, c in pc.items() if c == best)
            out.append((rank, left, right, left + right, best))
            nxt = []
            for syms in words:
                o, j = [], 0
                while j < len(syms):
                    if (j + 1 < len(syms) and syms[j] == left
                            and syms[j + 1] == right):
                        o.append(left + right)
                        j += 2
                    else:
                        o.append(syms[j])
                        j += 1
                nxt.append(o)
            words = nxt
        return out

    assert bpe_merges_local(wc, n_merges) == recount(wc, n_merges)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_bpe_heap_encoder_equals_sequential_reference(data):
    """r09: the candidate-heap kernel (production encode tier) must
    equal the O(n_merges*len) sequential reference on ARBITRARY merge
    lists — including adversarial ones a trainer would never emit
    (duplicate symbol-string creations, merges whose operands never
    co-occur), which is exactly where a lowest-rank-first priority
    loop diverges from sequential semantics."""
    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        _encode_word_heap, _merge_candidate_index, bpe_encode_word_seq,
    )

    alphabet = "abc"
    n_merges = data.draw(st.integers(min_value=0, max_value=12))
    pool = list(alphabet)
    merges = []
    for rank in range(1, n_merges + 1):
        lft = data.draw(st.sampled_from(pool))
        rgt = data.draw(st.sampled_from(pool))
        merged = lft + rgt
        merges.append((rank, lft, rgt, merged, 0))
        pool.append(merged)  # later merges may reuse/recreate strings
    words = data.draw(st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=10),
        min_size=1, max_size=8))
    seed, by_symbol = _merge_candidate_index(merges)
    for w in words:
        assert (_encode_word_heap(w, seed, by_symbol)
                == bpe_encode_word_seq(w, merges)), (w, merges)


def test_bpe_heap_encoder_is_sequential_not_priority_loop():
    """Pin the semantic choice on the one case where sequential
    rank-order application and a lowest-rank-first priority loop
    genuinely differ: a pair that first becomes ADJACENT only after
    its rank has passed (requires a later merge to recreate an
    earlier symbol string). Sequential (= bpe_encode_expr = the
    DuckDB certificate chain) does NOT merge it."""
    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        _encode_word_heap, _merge_candidate_index, bpe_encode_word_seq,
    )

    merges = [(1, "a", "b", "ab", 0),
              (2, "abc", "d", "abcd", 0),   # 'abc' doesn't exist yet
              (3, "ab", "c", "abc", 0)]     # ...until after rank 2
    seed, by_symbol = _merge_candidate_index(merges)
    got = _encode_word_heap("abcd", seed, by_symbol)
    assert got == ["abc", "d"]              # NOT ['abcd']
    assert got == bpe_encode_word_seq("abcd", merges)
