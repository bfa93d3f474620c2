"""BPE training (`ext/bpe.py`) vs an independent python model of the
reference algorithm (Sennrich-style greedy merges over the word
histogram)."""

from collections import Counter

from sftp_data_ingestion_spark.ext.bpe import train_bpe_merges


def _model_merges(words, n_merges):
    """Reference implementation: list-based greedy BPE."""
    hist = Counter(words)
    vocab = {tuple(w): f for w, f in hist.items()}
    out = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # tie-break: count desc, then (left, right) ASC
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        cnt = pairs[best_pair]
        out.append((step, best_pair[0], best_pair[1], cnt))
        x, y = best_pair
        new_vocab = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == x and syms[i + 1] == y:
                    merged.append(x + y)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + f
        vocab = new_vocab
    return out


def test_bpe_matches_python_model(spark):
    words = (
        ["lower"] * 5 + ["lowest"] * 2 + ["newer"] * 6 + ["wider"] * 3
        + ["aaa"] * 4  # overlapping same-symbol pair case
        + ["aaaaa"] * 2 + ["aaaaaa"] * 2  # runs >= 5: greedy must give
        # [aa,aa,a] / [aa,aa,aa]; the old multi-pass replace() merge
        # stranded every other symbol ([aa,a,aa] / [aa,a,aa,a])
    )
    df = spark.createDataFrame([( " ".join(words),)], "text string")
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in train_bpe_merges(df, n_merges=4).orderBy("step").collect()
    ]
    assert got == _model_merges(words, 4)


def test_bpe_greedy_overlap_semantics(spark):
    # 'aaaa' with best pair (a,a): greedy leftmost -> 'aa','aa';
    # next step's best pair must therefore be (aa, aa)
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = [
        (r["step"], r["left_sym"], r["right_sym"])
        for r in train_bpe_merges(df, n_merges=2).orderBy("step").collect()
    ]
    assert got[0] == (1, "a", "a")
    assert got[1] == (2, "aa", "aa")


def test_bpe_long_same_symbol_runs(spark):
    # runs of 5 and 6 'a's: greedy pairs left-to-right, so after
    # merging (a,a) the vocab holds [aa,aa,a] and [aa,aa,aa]; step 2's
    # (aa,aa) count is 1 (from 'aaaaa', positions 0-1) + 2 (from
    # 'aaaaaa': overlapping adjacencies at 0-1 and 1-2) per word copy
    df = spark.createDataFrame([("aaaaa aaaaaa",)], "text string")
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in train_bpe_merges(df, n_merges=2).orderBy("step").collect()
    ]
    assert got == _model_merges(["aaaaa", "aaaaaa"], 2)


def test_fence_char_words_excluded(spark):
    """Words containing the '|' symbol fence must be excluded from
    training, not silently corrupt the sequence encoding."""
    df = spark.createDataFrame([("ab ab a|b a|b a|b",)], "text string")
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in train_bpe_merges(df, n_merges=1).collect()
    ]
    # only 'ab' x2 trains; the three 'a|b' words are out
    assert got == [("a", "b", 2)]
