"""duration_batches / batch_padding_report — determinism vs a python
md5 reference, batching invariants, the padding bound, and hygiene."""

from __future__ import annotations

import hashlib

import pytest

from jepl_spark.operators.batching import (
    assign_shards,
    batch_padding_report,
    duration_batches,
)


def _h(seed: str, cid: str) -> int:
    return int(hashlib.md5(f"{seed}:{cid}".encode()).hexdigest()[:15], 16)


def _reference(rows, batch_size, bucket_ms, shards, seed="bucket"):
    """Pure-python duration_batches replica."""
    keyed = []
    for cid, dur in rows:
        if cid is None or dur is None or dur <= 0:
            continue
        h = _h(seed, cid)
        keyed.append((h % shards, dur // bucket_ms, h, cid, dur))
    out = {}
    groups = {}
    for row in keyed:
        groups.setdefault((row[0], row[1]), []).append(row)
    for (shard, bucket), grp in groups.items():
        grp.sort(key=lambda r: (r[2], r[3], r[4]))
        for rn, (_, _, _, cid, dur) in enumerate(grp):
            out[cid] = (shard, bucket, rn // batch_size,
                        rn % batch_size, dur)
    return out


def test_duration_batches_matches_python_reference(spark):
    rows = [(f"clip-{i:04d}", 200 + (i * 37) % 1801) for i in range(400)]
    rows += [(None, 500), ("bad-zero", 0), ("bad-neg", -10),
             ("bad-null", None)]
    df = spark.createDataFrame(rows, "clip_id string, dur_ms int")
    got = {
        r.clip_id: (r.shard, r.bucket, r.batch_idx, r.pos_in_batch,
                    r.dur_ms)
        for r in duration_batches(df, batch_size=8, bucket_ms=250,
                                  shards=4).collect()
    }
    assert got == _reference(rows, 8, 250, 4)


def test_duration_batches_invariants(spark):
    rows = [(f"c{i:05d}", 100 + (i * 53) % 5000) for i in range(1000)]
    df = spark.createDataFrame(rows, "clip_id string, dur_ms int")
    batches = duration_batches(df, batch_size=16, bucket_ms=500,
                               shards=8).cache()
    rep = batch_padding_report(batches).collect()
    per_group = {}
    for r in rep:
        assert 1 <= r.n_clips <= 16
        # padding bound: every clip within bucket_ms of the batch max
        assert r.pad_ms <= r.n_clips * (500 - 1)
        per_group.setdefault((r.shard, r.bucket), []).append(
            (r.batch_idx, r.n_clips))
    # only the LAST batch of a (shard, bucket) may be short, and
    # batch indexes are contiguous from 0
    for grp in per_group.values():
        grp.sort()
        assert [b for b, _ in grp] == list(range(len(grp)))
        assert all(n == 16 for _, n in grp[:-1])
    # bucket homogeneity: duration spread inside a bucket < bucket_ms
    for r in batches.collect():
        assert r.bucket == r.dur_ms // 500
    batches.unpersist()


def test_duration_batches_partitioning_invariant(spark):
    rows = [(f"c{i}", 100 + i * 7) for i in range(300)]
    df = spark.createDataFrame(rows, "clip_id string, dur_ms int")
    a = sorted(map(tuple, duration_batches(
        df.coalesce(1), 3, 200, shards=4).collect()))
    b = sorted(map(tuple, duration_batches(
        df.repartition(13), 3, 200, shards=4).collect()))
    assert a == b


def _shard_reference(rows, shard_bytes, groups, seed="shard"):
    grouped = {}
    for cid, sz in rows:
        if cid is None or sz is None or sz <= 0:
            continue
        h = _h(seed, cid)
        grouped.setdefault(h % groups, []).append((h, cid, sz))
    out = {}
    for g, grp in grouped.items():
        grp.sort()
        cum = 0
        for h, cid, sz in grp:
            out[cid] = (g, cum // shard_bytes, cum, sz)
            cum += sz
    return out


def test_assign_shards_matches_python_reference(spark):
    rows = [(f"clip-{i:04d}", 1 + (i * 131) % 4000) for i in range(500)]
    rows += [(None, 10), ("z", 0), ("zz", -5)]
    df = spark.createDataFrame(rows, "clip_id string, n_bytes int")
    got = {r.clip_id: (r.group, r.shard_idx, r.group_offset, r.n_bytes)
           for r in assign_shards(df, shard_bytes=10_000,
                                  size_col="n_bytes",
                                  groups=4).collect()}
    assert got == _shard_reference(rows, 10_000, 4)


def test_assign_shards_invariants(spark):
    """Shard indexes are contiguous per group; every shard except a
    group's last reaches past its nominal boundary (rows never split,
    so the overflow row carries it across)."""
    rows = [(f"c{i:04d}", 50 + (i * 17) % 900) for i in range(800)]
    df = spark.createDataFrame(rows, "clip_id string, n_bytes int")
    out = assign_shards(df, shard_bytes=5_000, size_col="n_bytes",
                        groups=4).collect()
    per_shard = {}
    for r in out:
        assert r.shard_idx == r.group_offset // 5_000
        s = per_shard.setdefault((r.group, r.shard_idx),
                                 {"end": 0, "n": 0})
        s["end"] = max(s["end"], r.group_offset + r.n_bytes)
        s["n"] += 1
    by_group = {}
    for (g, sidx), s in per_shard.items():
        by_group.setdefault(g, []).append((sidx, s["end"]))
    for g, shards in by_group.items():
        shards.sort()
        assert [s for s, _ in shards] == list(range(len(shards)))
        for sidx, end in shards[:-1]:
            assert end >= (sidx + 1) * 5_000


def test_duration_batches_validation(spark):
    df = spark.createDataFrame([("a", 1)], "clip_id string, dur_ms int")
    with pytest.raises(ValueError):
        duration_batches(df, 0, 100)
    with pytest.raises(ValueError):
        duration_batches(df, 4, 0)
    with pytest.raises(ValueError):
        duration_batches(df, 4, 100, shards=0)


def test_pack_clips_byte_true_and_deterministic(spark):
    """Pack materialization is exact byte surgery: slicing the pack's
    payload at each manifest entry decodes bit-for-bit to the clip's
    own decoded PCM; packs never mix (sr, codec); the plan is
    invariant to input partitioning; budget respected up to the
    never-split overflow rule."""
    import numpy as np

    from jepl_spark.operators.batching import _BYTES_PER_SAMPLE, pack_clips
    from jepl_spark.sources import audio
    from jepl_spark.sources.clips import clip_row, clips_df

    clips = clips_df(spark, 120, partitions=4)
    packs = pack_clips(clips, budget_ms=5000, groups=4).collect()
    assert packs
    seen = set()
    for p in packs:
        bps = _BYTES_PER_SAMPLE[p.codec]
        blob = bytes(p.bytes)
        assert p.n_samples * bps == len(blob)
        assert p.n_clips == len(p.manifest)
        for m in p.manifest:
            i = int(m.clip_id.split("-")[1])
            src = clip_row(i)
            assert src["sr_hz"] == p.sr_hz and src["codec"] == p.codec
            a = m.offset_samples * bps
            b = a + m.n_samples * bps
            got = audio.decode(blob[a:b], p.codec)
            want = audio.decode(src["bytes"], src["codec"])
            assert got.size == want.size
            assert np.array_equal(got, want), m.clip_id
            seen.add(m.clip_id)
    assert len(seen) == 120  # every clip packed exactly once

    # partitioning invariance of the assignment
    packs2 = pack_clips(
        clips_df(spark, 120, partitions=13), budget_ms=5000, groups=4
    ).collect()
    key = lambda ps: sorted(
        (p.sr_hz, p.codec, p.group, p.pack_idx,
         tuple((m.clip_id, m.offset_samples) for m in p.manifest))
        for p in ps
    )
    assert key(packs) == key(packs2)

    # start-offset rule (the documented never-split property, checked
    # against an independent reconstruction): walking each family's
    # packs in pack_idx order, the running duration cumsum puts every
    # clip's START in exactly the pack it was assigned —
    # pack_idx == start div budget_ms (a pack overflows by at most
    # one clip; indices may legitimately skip if a clip spans >1
    # budget, so contiguity is NOT the invariant)
    from collections import defaultdict
    fam = defaultdict(list)
    for p in packs:
        fam[(p.sr_hz, p.codec, p.group)].append(p)
    for (sr, _codec, _g), ps in fam.items():
        start = 0
        for p in sorted(ps, key=lambda p: p.pack_idx):
            for m in p.manifest:
                src = clip_row(int(m.clip_id.split("-")[1]))
                assert start // 5000 == p.pack_idx, (m.clip_id, start)
                start += src["dur_ms"]


def test_pack_clips_validation(spark):
    import pytest

    from jepl_spark.operators.batching import pack_clips
    from jepl_spark.sources.clips import clips_df
    from jepl_spark.sources.containers import wav_encode

    clips = clips_df(spark, 4)
    with pytest.raises(ValueError):
        pack_clips(clips, budget_ms=0)
    with pytest.raises(ValueError):
        pack_clips(clips.drop("dur_ms"), budget_ms=1000)
    # container rows fail fast with an actionable message
    import numpy as np

    wav = spark.createDataFrame(
        [("w", wav_encode(np.zeros(800, dtype=np.float32), 8000), "wav",
          8000, 100)],
        "clip_id string, bytes binary, codec string, sr_hz int, "
        "dur_ms int")
    with pytest.raises(Exception) as ei:
        pack_clips(wav, budget_ms=1000).collect()
    assert "raw codecs only" in str(ei.value)

    # a pcm16 payload with an odd byte length would silently desync
    # every later clip's manifest offset — it must raise instead
    odd = spark.createDataFrame(
        [("o", b"\x00\x01\x02\x03\x04", "pcm16", 8000, 100)],
        "clip_id string, bytes binary, codec string, sr_hz int, "
        "dur_ms int")
    with pytest.raises(Exception) as ei:
        pack_clips(odd, budget_ms=1000).collect()
    assert "multiple of" in str(ei.value)

    # plan_only: the assignment frame, no byte materialization
    plan = pack_clips(clips, budget_ms=1000, plan_only=True)
    assert set(plan.columns) == {"clip_id", "sr_hz", "codec", "group",
                                 "pack_idx"}
    full = pack_clips(clips, budget_ms=1000).collect()
    assert plan.select("sr_hz", "codec", "group", "pack_idx") \
        .distinct().count() == len(full)


def test_unpack_clips_unknown_codec_raises(spark):
    import pytest

    from jepl_spark.operators.batching import unpack_clips

    fake = spark.createDataFrame(
        [(8000, "opus", b"\x00\x01",
          [{"clip_id": "c", "offset_samples": 0, "n_samples": 2}])],
        "sr_hz int, codec string, bytes binary, "
        "manifest array<struct<clip_id:string,offset_samples:bigint,"
        "n_samples:bigint>>")
    with pytest.raises(Exception) as ei:
        unpack_clips(fake).collect()
    assert "unknown codec" in str(ei.value)


def test_unpack_clips_roundtrip_identity(spark):
    """unpack(pack(clips)) returns every clip's bytes BIT-IDENTICAL
    (pure-JVM slicing), with exact sample counts and refreshed
    dur_ms; the plan contains no Python exec nodes."""
    from pyspark.sql import functions as F

    from jepl_spark.operators.batching import pack_clips, unpack_clips
    from jepl_spark.sources.clips import clips_df

    clips = clips_df(spark, 80)
    packs = pack_clips(clips, budget_ms=4000, groups=4)
    back = unpack_clips(packs)
    both = back.alias("b").join(
        clips.select(
            "clip_id", F.col("bytes").alias("orig"), "sr_hz", "codec"
        ).alias("o"),
        on="clip_id",
    )
    n_total = both.count()
    assert n_total == 80
    mismatch = both.where(
        (F.md5("b.bytes") != F.md5("o.orig"))
        | (F.col("b.sr_hz") != F.col("o.sr_hz"))
        | (F.col("b.codec") != F.col("o.codec"))
    ).count()
    assert mismatch == 0
    # JVM-only plan (the unpack itself adds no Python nodes)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

    import pytest

    with pytest.raises(ValueError):
        unpack_clips(packs.drop("manifest"))
