"""Property tests (hypothesis) for the closed-form boundary math that
BOTH the engine and the DuckDB oracles implement independently — the
chunking fulls/tail formulas and the split thresholds.  These are pure
python (no Spark session), so hypothesis can sweep thousands of
parameter combinations in milliseconds; the Spark-vs-oracle gates then
only need to prove faithful *implementation* of a formula that is
itself proven here against a naive simulation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def naive_chunks(n: int, chunk: int, stride: int, min_tail: int):
    """Straight-line simulation: walk starts, emit full windows, then
    the tail rule — no closed forms anywhere."""
    out = []
    s = 0
    while s + chunk <= n:
        out.append((s, chunk))
        s += stride
    if min_tail > 0 and s < n and (n - s) >= min_tail:
        out.append((s, n - s))
    return out


def formula_chunks(n: int, chunk: int, stride: int, min_tail: int):
    """The closed form shared by chunk_documents, chunk_clips, and
    their oracles."""
    fulls = (n - chunk) // stride + 1 if n >= chunk else 0
    out = [(i * stride, chunk) for i in range(fulls)]
    ts = fulls * stride
    if min_tail > 0 and ts < n and (n - ts) >= min_tail:
        out.append((ts, n - ts))
    return out


@settings(max_examples=2000, deadline=None)
@given(
    n=st.integers(0, 5000),
    chunk=st.integers(1, 600),
    overlap_frac=st.integers(0, 99),
    min_tail=st.integers(0, 600),
)
def test_chunk_formula_equals_simulation(n, chunk, overlap_frac, min_tail):
    stride = max(1, chunk - (chunk * overlap_frac) // 100)
    assert formula_chunks(n, chunk, stride, min_tail) == naive_chunks(
        n, chunk, stride, min_tail
    )


@settings(max_examples=500, deadline=None)
@given(
    sr=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    dur_ms=st.integers(1, 60_000),
    chunk_ms=st.integers(1, 5000),
    hop_ms=st.integers(1, 5000),
    min_tail_ms=st.integers(0, 5000),
)
def test_audio_chunk_sample_math(sr, dur_ms, chunk_ms, hop_ms, min_tail_ms):
    """The sample-domain variant (integer // of sr·ms products) also
    matches the simulation, and chunks never read past the clip."""
    n = sr * dur_ms // 1000
    chunk_n = sr * chunk_ms // 1000
    hop_n = sr * hop_ms // 1000
    tail_n = sr * min_tail_ms // 1000
    if chunk_n == 0 or hop_n == 0:
        return  # sub-sample windows are rejected by the operator
    got = formula_chunks(n, chunk_n, hop_n, tail_n if min_tail_ms > 0 else 0)
    want = naive_chunks(n, chunk_n, hop_n, tail_n if min_tail_ms > 0 else 0)
    assert got == want
    assert all(s + ln <= n for s, ln in got)
    # hop >= chunk with all tails kept covers every sample exactly once
    if hop_n == chunk_n and min_tail_ms > 0 and tail_n <= 1:
        assert sum(ln for _, ln in got) == n


@settings(max_examples=1000, deadline=None)
@given(
    weights=st.lists(
        st.integers(1, 100), min_size=1, max_size=6
    ),
    h=st.integers(0, (1 << 60) - 1),
)
def test_split_thresholds_disjoint_exhaustive(weights, h):
    """Every hash lands in exactly one split under the cumulative
    int(cum·2^60) thresholds — including the float-accumulation edge
    (0.8+0.1 != 0.9 exactly) the oracle literals must reproduce."""
    total = sum(weights)
    fracs = [w / total for w in weights]
    domain = float(1 << 60)
    cum = 0.0
    bounds = []
    for f in fracs[:-1]:
        cum += f
        bounds.append(int(cum * domain))
    label = len(bounds)  # default: last split
    for i, b in enumerate(bounds):
        if h < b:
            label = i
            break
    # exhaustive: some label always assigned; disjoint: the first
    # matching threshold wins and thresholds are monotone
    assert 0 <= label < len(fracs)
    assert bounds == sorted(bounds)


@settings(max_examples=300, deadline=None)
@given(n=st.integers(0, 10_000_000), m=st.integers(63, 1 << 22),
       k=st.integers(1, 8))
def test_bloom_fpr_estimate_in_unit_interval(n, m, k):
    from jepl_spark.operators.bloom import expected_fpr

    f = expected_fpr(n, m, k)
    assert 0.0 <= f <= 1.0


@settings(max_examples=200, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(h, w, c, seed):
    """Any 8-bit pixel array survives the in-repo PNG container
    byte-exactly (pure numpy+zlib — no Spark needed)."""
    import numpy as np

    from jepl_spark.sources import containers as C

    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )
    out = C.png_decode(C.png_encode(px))
    assert out.shape == px.shape and (out == px).all()


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(1, 4000),
    sr=st.sampled_from([8000, 16000, 44100]),
    codec=st.sampled_from(["pcm16", "ulaw", "alaw"]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_property(n, sr, codec, seed):
    """WAV container transit is bit-identical to the raw codec payload
    transit for any sample stream — the container adds framing only."""
    import numpy as np

    from jepl_spark.sources import audio
    from jepl_spark.sources import containers as C

    x = (np.random.default_rng(seed).random(n) * 2 - 1).astype(np.float64)
    got, got_sr, got_codec = C.wav_decode(C.wav_encode(x, sr, codec))
    raw = audio.decode(audio.encode(x, codec), codec)
    assert (got_sr, got_codec) == (sr, codec)
    assert got.shape == raw.shape and (got == raw).all()


def naive_pack(tokens: list, budget: int):
    """Token-by-token walk: place every doc's tokens consecutively,
    record which sequence each token lands in, then collapse to spans."""
    spans = []
    pos = 0
    for i, t in enumerate(tokens):
        seqs = {}
        for j in range(t):
            seqs.setdefault((pos + j) // budget, []).append(j)
        for seq, js in sorted(seqs.items()):
            spans.append((seq, i, js[0], (pos + js[0]) % budget, len(js)))
        pos += t
    return spans


def formula_pack(tokens: list, budget: int):
    """The closed form pack_sequences (and its oracle) implement."""
    spans = []
    pos = 0
    for i, t in enumerate(tokens):
        start, end = pos, pos + t
        for seq in range(start // budget, (end - 1) // budget + 1):
            s = max(start, seq * budget)
            e = min(end, (seq + 1) * budget)
            spans.append((seq, i, s - start, s - seq * budget, e - s))
        pos += t
    return spans


@settings(max_examples=500, deadline=None)
@given(
    tokens=st.lists(st.integers(1, 300), min_size=1, max_size=40),
    budget=st.integers(1, 257),
)
def test_pack_span_formula_equals_token_walk(tokens, budget):
    assert formula_pack(tokens, budget) == naive_pack(tokens, budget)
