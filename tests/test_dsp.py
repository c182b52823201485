"""Golden tests for the DSP core against independent numpy references.

The numpy oracles below implement the *published semantics* of the reference
DSP layer (/root/reference/mlx_audio/utils.py) from its documented contract:
strided framing + rFFT, scatter-add overlap-add normalized by window sum.
"""

import numpy as np
import pytest

import mlx_audio_tpu.dsp as dsp


def np_stft(x, n_fft, hop, win_length, window, center=True, pad_mode="reflect"):
    w = dsp._window_np(window, win_length)
    if len(w) < n_fft:
        w = np.concatenate([w, np.zeros(n_fft - len(w))])
    if center:
        pad = n_fft // 2
        if pad_mode == "reflect":
            x = np.concatenate([x[1 : pad + 1][::-1], x, x[-(pad + 1) : -1][::-1]])
        else:
            x = np.pad(x, pad)
    num_frames = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] for i in range(num_frames)])
    return np.fft.rfft(frames * w)


def np_istft(spec, hop, win_length, window, center=True, length=None):
    # spec: [n_freqs, num_frames]
    w = dsp._window_np(window, win_length + 1)[:-1]
    num_frames = spec.shape[1]
    t = (num_frames - 1) * hop + win_length
    recon = np.zeros(t)
    wsum = np.zeros(t)
    frames_time = np.fft.irfft(spec, axis=0).T  # [frames, n_fft]
    for i in range(num_frames):
        recon[i * hop : i * hop + win_length] += frames_time[i, :win_length] * w
        wsum[i * hop : i * hop + win_length] += w
    recon = np.where(wsum != 0, recon / np.where(wsum == 0, 1, wsum), recon)
    if center and length is None:
        recon = recon[win_length // 2 : -(win_length // 2)]
    if length is not None:
        recon = recon[:length]
    return recon


@pytest.mark.parametrize(
    "n_fft,hop,win,window",
    [(800, 200, 800, "hann"), (400, 160, 400, "hann"), (1024, 256, 1024, "hamming"),
     (512, 128, 400, "blackman"), (256, 64, 256, "bartlett")],
)
def test_stft_matches_numpy(n_fft, hop, win, window):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8000).astype(np.float32)
    ref = np_stft(x, n_fft, hop, win, window)
    out = np.asarray(dsp.stft(x, n_fft, hop, win, window))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out.real, ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(out.imag, ref.imag, atol=2e-3, rtol=1e-4)


def test_stft_constant_pad():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4000).astype(np.float32)
    ref = np_stft(x, 400, 100, 400, "hann", pad_mode="constant")
    out = np.asarray(dsp.stft(x, 400, 100, 400, "hann", pad_mode="constant"))
    np.testing.assert_allclose(out.real, ref.real, atol=2e-3)


def test_stft_batched():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    out = np.asarray(dsp.stft(x, 400, 160))
    for b in range(3):
        ref = np_stft(x[b], 400, 160, 400, "hann")
        np.testing.assert_allclose(np.asarray(out[b]).real, ref.real, atol=2e-3)


@pytest.mark.parametrize("n_fft,hop", [(800, 200), (400, 100), (512, 128)])
def test_istft_matches_numpy(n_fft, hop):
    rng = np.random.default_rng(3)
    spec = (
        rng.standard_normal((n_fft // 2 + 1, 40))
        + 1j * rng.standard_normal((n_fft // 2 + 1, 40))
    )
    ref = np_istft(spec, hop, n_fft, "hann")
    out = np.asarray(dsp.istft(spec.astype(np.complex64), hop, n_fft, "hann"))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_stft_istft_roundtrip():
    # Reference istft normalizes by the window *sum* (utils.py:150), so the
    # round trip scales the interior by sum(w^2)/sum(w) = 0.75 for hann at
    # hop = n_fft/4.  Check exact parity with the numpy oracle end-to-end,
    # plus the theoretical interior scale.
    rng = np.random.default_rng(4)
    x = rng.standard_normal(6400).astype(np.float32)
    spec = dsp.stft(x, 512, 128, 512, "hann")
    recon = np.asarray(dsp.istft(np.asarray(spec).T, 128, 512, "hann"))
    ref = np_istft(np_stft(x, 512, 128, 512, "hann").T, 128, 512, "hann")
    np.testing.assert_allclose(recon, ref, atol=5e-3)
    n = min(len(recon), 6400)
    np.testing.assert_allclose(recon[512:n-512], 0.75 * x[512:n-512], atol=2e-2)


def test_overlap_add_matches_loop():
    rng = np.random.default_rng(5)
    frames = rng.standard_normal((7, 100)).astype(np.float32)
    hop = 30
    out = np.asarray(dsp.overlap_add(frames, hop))
    ref = np.zeros(6 * hop + 100, dtype=np.float32)
    for i in range(7):
        ref[i * hop : i * hop + 100] += frames[i]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_mel_filters_htk_and_slaney():
    for scale, norm in [("htk", None), ("slaney", "slaney")]:
        fb = np.asarray(dsp.mel_filters(16000, 400, 80, mel_scale=scale, norm=norm))
        assert fb.shape == (80, 201)
        assert fb.min() >= 0
        # every mel band has some support
        assert (fb.sum(axis=1) > 0).all()
        # triangles peak once
        assert np.isfinite(fb).all()


def test_mel_filters_against_librosa_style_reference():
    # Cross-check the slaney filterbank against a direct construction.
    fb = np.asarray(dsp.mel_filters(22050, 1024, 40, mel_scale="slaney", norm="slaney"))
    # center frequencies should be monotonically increasing
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()


def test_log_mel_spectrogram_shape():
    from mlx_audio_tpu.models.stt.whisper.audio import log_mel_spectrogram

    x = np.zeros(16000, dtype=np.float32)
    mel = np.asarray(log_mel_spectrogram(x, n_mels=80))
    assert mel.shape == (100, 80)
    assert np.isfinite(mel).all()


def test_windows_match_reference_formulas():
    for name in ["hann", "hamming", "blackman", "bartlett"]:
        w = dsp._window_np(name, 128)
        assert w.shape == (128,)
        assert abs(w[0]) < 0.1 or name == "hamming"


def test_frame_signal_slice_path_matches_gather():
    """frame_length % hop == 0 uses the slice path; must equal the gather."""
    import numpy as np
    import jax.numpy as jnp
    from mlx_audio_tpu.dsp import frame_signal

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 1037)), dtype=jnp.float32)
    out = frame_signal(x, 20, 5)
    idx = np.arange(1 + (1037 - 20) // 5)[:, None] * 5 + np.arange(20)[None, :]
    ref = np.asarray(x)[:, idx]
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sinegen_resample_helpers_match_interpolate():
    """The gather-free integer-factor linear resamplers must be bit-equal
    to nn.interpolate (same arithmetic, different lowering)."""
    import numpy as np
    import jax.numpy as jnp
    from mlx_audio_tpu.nn.interpolate import interpolate
    from mlx_audio_tpu.models.tts.kokoro.istftnet import (
        _downsample_linear_int_last,
        _upsample_linear_int_last,
    )

    rng = np.random.default_rng(1)
    for s in (2, 3, 5, 300, 600):
        f = 7
        x = jnp.asarray(rng.standard_normal((2, 3, f * s)), dtype=jnp.float32)
        ref = jnp.swapaxes(
            interpolate(jnp.swapaxes(x, 1, 2), scale_factor=1 / s,
                        mode="linear"), 1, 2)
        out = _downsample_linear_int_last(x, s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=0)

        xf = jnp.asarray(rng.standard_normal((2, 3, f)), dtype=jnp.float32)
        ref_u = jnp.swapaxes(
            interpolate(jnp.swapaxes(xf, 1, 2), scale_factor=s,
                        mode="linear"), 1, 2)
        out_u = _upsample_linear_int_last(xf, s)
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u),
                                   rtol=1e-6, atol=1e-6)
