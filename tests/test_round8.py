"""Round-8 additions: IMA-ADPCM codec, fold-eviction hardening."""

import numpy as np
import pytest

from tubes_spark.operators.multimodal import (
    _ADPCM_INDEX,
    _ADPCM_STEPS,
    adpcm_energy_windows,
    decode_adpcm_ima,
    encode_adpcm_ima,
)


def _naive_decode(nibbles):
    """Independent scalar reference decoder (re-derived from the IMA
    spec, no shared helpers) — guards table/packing bugs in the real
    one."""
    pred, idx, out = 0, 0, []
    for nib in nibbles:
        step = _ADPCM_STEPS[idx]
        mag = nib & 7
        delta = step // 8 + (step if mag & 4 else 0) \
            + (step // 2 if mag & 2 else 0) + (step // 4 if mag & 1 else 0)
        pred = pred + (-delta if nib & 8 else delta)
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _ADPCM_INDEX[mag]))
        out.append(pred)
    return out


def _pack(nibbles):
    import struct

    body = bytearray(struct.pack("<4sIhBB", b"ADP1", len(nibbles), 0, 0, 0))
    for j in range(0, len(nibbles) - 1, 2):
        body.append(nibbles[j] | (nibbles[j + 1] << 4))
    if len(nibbles) % 2:
        body.append(nibbles[-1])
    return bytes(body)


def test_adpcm_decode_matches_independent_reference():
    rng = np.random.RandomState(11)
    for n in (0, 1, 7, 256, 1001):
        nibs = [int(x) for x in rng.randint(0, 16, n)]
        assert decode_adpcm_ima(_pack(nibs)).tolist() == _naive_decode(nibs)


def test_adpcm_roundtrip_tracks_smooth_signal():
    # a sine the quantizer can track: steady-state error stays well
    # under the signal amplitude; also exercises both signs
    t = np.arange(2000)
    s = (8000 * np.sin(2 * np.pi * t / 200)).astype(np.int16)
    dec = decode_adpcm_ima(encode_adpcm_ima(s))
    err = np.abs(dec.astype(np.int64) - s.astype(np.int64))
    assert len(dec) == len(s)
    assert err[100:].max() < 600  # post-attack tracking error

    # constant signal: decoder converges and stays within the small
    # steps once locked
    c = np.full(400, 12345, np.int16)
    dec_c = decode_adpcm_ima(encode_adpcm_ima(c))
    assert np.abs(dec_c[-100:].astype(np.int64) - 12345).max() <= 16


def test_adpcm_roundtrip_deterministic_and_bounded():
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:  # pragma: no cover
        pytest.skip("hypothesis unavailable")

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
           st.integers(0, 1))
    def check(vals, _salt):
        s = np.array(vals, dtype=np.int16)
        enc = encode_adpcm_ima(s)
        assert enc == encode_adpcm_ima(s)
        dec = decode_adpcm_ima(enc)
        assert len(dec) == len(s)
        # hard bound: one step's worth of slew per sample means error
        # never exceeds the int16 span
        if len(s):
            assert np.abs(dec.astype(np.int64) - s.astype(np.int64)).max() <= 65535

    check()


def test_adpcm_rejects_malformed():
    for bad in (b"", b"ADP", b"XXXX" + bytes(8)):
        with pytest.raises(ValueError):
            decode_adpcm_ima(bad)
    import struct

    # truncated body: claims 10 samples, carries none
    with pytest.raises(ValueError):
        decode_adpcm_ima(struct.pack("<4sIhBB", b"ADP1", 10, 0, 0, 0))
    # out-of-range initial index
    with pytest.raises(ValueError):
        decode_adpcm_ima(struct.pack("<4sIhBB", b"ADP1", 0, 0, 89, 0))
    with pytest.raises(ValueError):
        encode_adpcm_ima(np.array([40000]))


def test_adpcm_energy_windows_integer_parity():
    nibs = [(37 * 13 + t * 7) % 16 for t in range(256)]
    dec = np.array(_naive_decode(nibs), dtype=np.int64)
    want = [int((dec[i:i + 64] ** 2).sum()) for i in range(0, 256, 64)]
    assert adpcm_energy_windows(_pack(nibs)) == want
