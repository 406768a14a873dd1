"""Property-test the PCM path with ARBITRARY waveforms (hypothesis) —
the registered multimodal_audio_energy query only ever sees the
formula-generated signal, so this covers the codec against general
int16 input: encode → little-endian bytes → np.frombuffer decode →
windowed energy/peak must equal a direct numpy computation, including
int16 extremes (±32767, -32768) whose squares overflow int16/int32 and
require the int64 upcast the decode stage performs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_wave = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=700
)


def _windows(v: np.ndarray, width: int = 160):
    for w in range(0, len(v), width):
        chunk = v[w : w + width].astype(np.int64)
        yield w // width, len(chunk), int((chunk * chunk).sum()), int(
            np.abs(chunk).max()
        )


@given(wave=_wave)
@settings(max_examples=60, deadline=None)
def test_pcm_roundtrip_windowed_energy(wave):
    v = np.array(wave, dtype=np.int64)
    payload = v.astype("<i2").tobytes()
    decoded = np.frombuffer(payload, dtype="<i2").astype(np.int64)
    assert (decoded == v).all()
    for win_idx, n, energy, peak in _windows(decoded):
        ref = v[win_idx * 160 : win_idx * 160 + 160]
        assert n == len(ref)
        assert energy == int((ref * ref).sum())
        assert peak == int(np.abs(ref).max())


def test_registered_audio_matches_formula_spot(spark, sf_dir):
    """Spot-pin the registered query's first windows against the
    generative formula computed directly in numpy."""
    from presto_truffle_spark.operators.multimodal import (
        multimodal_audio_energy,
    )

    rows = {
        (r.media_id, r.win_idx): r
        for r in multimodal_audio_energy(spark, sf_dir).collect()
    }
    assert rows
    for mid in list({m for m, _ in rows})[:20]:
        n = mid % 400 + 100
        t = np.arange(n, dtype=np.int64)
        v = ((mid * 31 + 7 * t * t) % 2048) - 1024
        for w in range(0, n, 160):
            chunk = v[w : w + 160]
            r = rows[(mid, w // 160)]
            assert r.n_samples == len(chunk)
            assert r.energy == int((chunk * chunk).sum())
            assert r.peak == int(np.abs(chunk).max())
