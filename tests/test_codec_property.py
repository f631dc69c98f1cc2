"""Property tests for the r8 container codecs: random sample tables round
through encode_mp4 -> parse_mp4 exactly; random frame cycles round through
encode_mp3_frames -> parse_mp3 with the closed-form arithmetic."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from polars_st_spark.operators import mp3 as M3
from polars_st_spark.operators import mp4 as M4


@settings(max_examples=40, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=300), min_size=1,
                   max_size=24),
    first_delta=st.integers(min_value=1, max_value=5),
    timescale=st.sampled_from([10, 600, 1000, 90000]),
    sync_every=st.integers(min_value=1, max_value=5),
    split_frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_mp4_sample_table_roundtrip(sizes, first_delta, timescale,
                                    sync_every, split_frac):
    frames = [bytes([(i * 37 + j) % 256 for j in range(n)])
              for i, n in enumerate(sizes)]
    n = len(frames)
    deltas = [first_delta] + [1] * (n - 1)
    chunk_split = max(1, min(n, int(n * split_frac) or 1))
    data = M4.encode_mp4(frames, timescale=timescale, deltas=deltas,
                         chunk_split=chunk_split, sync_every=sync_every)
    info = M4.parse_mp4(data)
    t = info.tracks[0]
    assert t.n_samples == n
    assert t.timescale == timescale
    assert t.duration_ticks == sum(deltas)
    assert t.sample_sizes.tolist() == [len(f) for f in frames]
    # decode timestamps are the exclusive prefix sums of the deltas
    acc = 0
    for k, d in enumerate(deltas):
        assert t.sample_ticks[k] == acc
        acc += d
    assert t.sync_samples.tolist() == list(range(0, n, sync_every))
    got = M4.extract_frames(data, every_n=1)
    assert [p for *_, p in got] == frames


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=40),
    cycle=st.lists(st.sampled_from([32, 48, 64, 96, 128, 160, 192, 256, 320]),
                   min_size=1, max_size=4),
    rate=st.sampled_from([32000, 44100, 48000]),
    id3=st.integers(min_value=0, max_value=200),
)
def test_mp3_walk_closed_forms(n, cycle, rate, id3):
    data = M3.encode_mp3_frames("prop", n, kbps_cycle=tuple(cycle),
                                sample_rate=rate, id3_junk=id3)
    info = M3.parse_mp3(data)
    assert info["n_frames"] == n
    assert info["sample_rate"] == rate
    assert info["duration_s"] == n * 1152 / rate
    expect_bytes = sum(
        (144 * cycle[k % len(cycle)] * 1000) // rate for k in range(n))
    assert info["total_audio_bytes"] == expect_bytes
    assert info["avg_bitrate_kbps"] == (
        sum(cycle[k % len(cycle)] for k in range(n)) / n)
    assert info["id3_bytes"] == (10 + id3 if id3 else 0)
    assert info["vbr"] == (len({cycle[k % len(cycle)] for k in range(n)}) > 1)
