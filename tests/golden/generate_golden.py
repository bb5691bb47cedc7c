"""Generate golden feature vectors from an INDEPENDENT torch implementation.

Provenance
----------
The production front-end (``ops/kaldi.py``, ``ops/features.py``) computes
features as JAX matmul-DFTs. The reference project computes Fbank through
``paddleaudio.compliance.kaldi.fbank`` (reference
``ppvector/data_utils/featurizer.py:83-101``), which is a line-for-line port
of ``torchaudio.compliance.kaldi.fbank``, itself a port of Kaldi's
``compute-fbank-feats`` (kaldi ``src/feat/feature-window.cc`` /
``feature-fbank.cc`` / ``mel-computations.cc``). The other four methods go
through ``paddle.audio.features`` (librosa-convention STFT/mel).

This generator re-implements those *published algorithms* in torch —
a different framework, different FFT (``torch.fft.rfft`` vs a DFT matmul),
different window constructor (``torch.hann_window`` vs a hand-rolled
cosine) and float64 accumulation — and freezes the outputs into
``golden_features.npz``. ``tests/test_golden_features.py`` compares the
production path against these constants, plus hand-derivable micro-asserts
for each known kaldi gotcha (window denominator, snip-edges frame count,
pre-emphasis edge handling, DC-removal order, mel-bank geometry, log floor).

Run:  python tests/golden/generate_golden.py
"""

import math
import os

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "golden_features.npz")
SR = 16000


# ---------------------------------------------------------------------------
# kaldi fbank  (torchaudio.compliance.kaldi.fbank algorithm, float64)
# ---------------------------------------------------------------------------
def vtln_warp_freq_torch(vtln_low, vtln_high, low_freq, high_freq,
                         warp, freq):
    """kaldi mel-computations.cc VtlnWarpFreq (piecewise linear)."""
    l = vtln_low * max(1.0, warp)
    h = vtln_high * min(1.0, warp)
    scale = 1.0 / warp
    fl, fh = scale * l, scale * h
    scale_left = (fl - low_freq) / (l - low_freq)
    scale_right = (high_freq - fh) / (high_freq - h)
    res = torch.where(freq < h, scale * freq,
                      high_freq + scale_right * (freq - high_freq))
    res = torch.where(freq < l,
                      low_freq + scale_left * (freq - low_freq), res)
    return torch.where((freq < low_freq) | (freq > high_freq), freq, res)


def kaldi_mel_banks_torch(num_bins, window_length_padded, sample_freq,
                          low_freq=20.0, high_freq=0.0, vtln_warp=1.0,
                          vtln_low=100.0, vtln_high=-500.0):
    """torchaudio ``get_mel_banks`` (kaldi mel-computations.cc).

    Triangles are linear in kaldi-mel 1127*ln(1+f/700) over the first
    ``window_length_padded//2`` fft bins; torchaudio then right-pads one
    zero column for the Nyquist bin. ``vtln_warp != 1`` warps each
    triangle's left/center/right mel points.
    """
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq += nyquist
    fft_bin_width = sample_freq / window_length_padded

    def mel_scale(freq):
        return 1127.0 * torch.log(1.0 + freq / 700.0)

    mel_low = 1127.0 * math.log(1.0 + low_freq / 700.0)
    mel_high = 1127.0 * math.log(1.0 + high_freq / 700.0)
    mel_freq_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = torch.arange(num_bins, dtype=torch.float64).unsqueeze(1)
    left_mel = mel_low + bin_idx * mel_freq_delta
    center_mel = left_mel + mel_freq_delta
    right_mel = center_mel + mel_freq_delta
    if vtln_warp != 1.0:
        if vtln_high < 0.0:
            vtln_high += nyquist

        def warp_mel(m):
            freq = 700.0 * (torch.exp(m / 1127.0) - 1.0)
            return mel_scale(vtln_warp_freq_torch(
                vtln_low, vtln_high, low_freq, high_freq, vtln_warp, freq))

        left_mel = warp_mel(left_mel)
        center_mel = warp_mel(center_mel)
        right_mel = warp_mel(right_mel)

    mel = mel_scale(fft_bin_width
                    * torch.arange(num_fft_bins, dtype=torch.float64))
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    bank = torch.maximum(torch.zeros(1, dtype=torch.float64),
                         torch.minimum(up_slope, down_slope))
    # Nyquist column zero-padded (torchaudio kaldi.py: pad(mel_energies,(0,1)))
    return torch.nn.functional.pad(bank, (0, 1))  # (num_bins, nfft/2+1)


def kaldi_fbank_torch(wave, sr=SR, num_mel_bins=23, frame_length=25.0,
                      frame_shift=10.0, preemphasis_coefficient=0.97,
                      remove_dc_offset=True, window_type="povey",
                      use_power=True, use_log_fbank=True, snip_edges=True,
                      use_energy=False, raw_energy=True, htk_compat=False,
                      energy_floor=1.0, vtln_warp=1.0):
    """torchaudio.compliance.kaldi.fbank with dither=0 and
    round_to_power_of_two=True; float64 throughout (high-precision
    golden). Covers the full option surface the reference's
    ``method_args`` passthrough exposes: snip_edges=False (reflected
    edges), use_energy/raw_energy/htk_compat, VTLN warp."""
    wave = torch.as_tensor(np.asarray(wave), dtype=torch.float64)
    window_shift = int(sr * frame_shift * 0.001)
    window_size = int(sr * frame_length * 0.001)
    padded_window_size = 1 << (window_size - 1).bit_length()

    if snip_edges:
        # _get_strided, snip_edges=True: m = 1 + (n-window_size) // shift
        m = 1 + (wave.numel() - window_size) // window_shift
        strided = wave.as_strided((m, window_size), (window_shift, 1)).clone()
    else:
        # torchaudio _get_strided snip_edges=False: reflect `pad` samples
        # on the left, append the whole reversed waveform, stride m frames
        num_samples = wave.numel()
        m = (num_samples + window_shift // 2) // window_shift
        pad = window_size // 2 - window_shift // 2
        reversed_wave = torch.flip(wave, [0])
        padded = torch.cat((reversed_wave[-pad:], wave, reversed_wave))
        strided = padded.as_strided((m, window_size),
                                    (window_shift, 1)).clone()

    if remove_dc_offset:
        strided = strided - strided.mean(dim=1, keepdim=True)

    def log_energy(x):
        e = torch.clamp(x.pow(2).sum(dim=1),
                        min=torch.finfo(torch.float32).eps).log()
        if energy_floor > 0.0:
            e = torch.clamp(e, min=math.log(energy_floor))
        return e

    energy = log_energy(strided) if (use_energy and raw_energy) else None
    if preemphasis_coefficient != 0.0:
        # replicate-pad the first column: frame[0] -= coeff * frame[0]
        offset = torch.nn.functional.pad(
            strided.unsqueeze(0), (1, 0), mode="replicate").squeeze(0)
        strided = strided - preemphasis_coefficient * offset[:, :-1]

    if window_type == "povey":
        # torchaudio: hann_window(periodic=False) ** 0.85 — denominator N-1
        window = torch.hann_window(window_size, periodic=False,
                                   dtype=torch.float64).pow(0.85)
    elif window_type == "hanning":
        window = torch.hann_window(window_size, periodic=False,
                                   dtype=torch.float64)
    else:
        raise ValueError(window_type)
    strided = strided * window
    if use_energy and not raw_energy:
        energy = log_energy(strided)

    if padded_window_size != window_size:
        strided = torch.nn.functional.pad(
            strided, (0, padded_window_size - window_size))

    spectrum = torch.fft.rfft(strided).abs()
    if use_power:
        spectrum = spectrum.pow(2.0)

    mel_banks = kaldi_mel_banks_torch(num_mel_bins, padded_window_size, sr,
                                      vtln_warp=vtln_warp)
    mel_energies = torch.mm(spectrum, mel_banks.T)
    if use_log_fbank:
        # torchaudio floors at float32 eps regardless of compute dtype
        eps = torch.finfo(torch.float32).eps
        mel_energies = torch.clamp(mel_energies, min=eps).log()
    if use_energy:
        e = energy.unsqueeze(1)
        mel_energies = (torch.cat((mel_energies, e), dim=1) if htk_compat
                        else torch.cat((e, mel_energies), dim=1))
    return mel_energies.numpy()


# ---------------------------------------------------------------------------
# paddle.audio.features-style methods (librosa conventions), float64
# ---------------------------------------------------------------------------
def stft_torch(wave, n_fft=512, hop_length=None, win_length=None,
               power=1.0, center=True, pad_mode="reflect"):
    """paddle.audio.features.Spectrogram semantics: hann fftbins=True
    (periodic), centre/reflect padding, magnitude**power, frames-major."""
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 4
    wave = torch.as_tensor(np.asarray(wave), dtype=torch.float64)
    window = torch.hann_window(win_length, periodic=True,
                               dtype=torch.float64)
    spec = torch.stft(wave, n_fft=n_fft, hop_length=hop_length,
                      win_length=win_length, window=window, center=center,
                      pad_mode=pad_mode, normalized=False, onesided=True,
                      return_complex=True)
    mag = spec.abs().pow(power)
    return mag.T.numpy()  # (T, n_fft//2+1)


def slaney_mel_matrix_torch(sr, n_fft, n_mels, f_min=50.0, f_max=None):
    """librosa.filters.mel (htk=False, norm='slaney') — the matrix
    paddle.audio.functional.compute_fbank_matrix produces."""
    if f_max is None:
        f_max = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = torch.linspace(0, sr / 2.0, n_bins, dtype=torch.float64)

    def hz_to_mel(f):
        f = torch.as_tensor(f, dtype=torch.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = math.log(6.4) / 27.0
        return torch.where(f >= min_log_hz,
                           min_log_mel + torch.log(f / min_log_hz) / logstep,
                           mels)

    def mel_to_hz(m):
        f_sp = 200.0 / 3
        freqs = m * f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = math.log(6.4) / 27.0
        return torch.where(m >= min_log_mel,
                           min_log_hz * torch.exp(logstep * (m - min_log_mel)),
                           freqs)

    mel_pts = torch.linspace(float(hz_to_mel(f_min)), float(hz_to_mel(f_max)),
                             n_mels + 2, dtype=torch.float64)
    hz_pts = mel_to_hz(mel_pts)
    fdiff = hz_pts[1:] - hz_pts[:-1]
    ramps = hz_pts.unsqueeze(1) - fft_freqs.unsqueeze(0)
    lower = -ramps[:-2] / fdiff[:-1].unsqueeze(1)
    upper = ramps[2:] / fdiff[1:].unsqueeze(1)
    weights = torch.clamp(torch.minimum(lower, upper), min=0.0)
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])  # slaney norm
    return (weights * enorm.unsqueeze(1)).numpy()  # (n_mels, n_bins)


def mel_spectrogram_torch(wave, sr=SR, n_fft=512, n_mels=64, f_min=50.0):
    spec = stft_torch(wave, n_fft=n_fft, power=2.0)
    mel = slaney_mel_matrix_torch(sr, n_fft, n_mels, f_min)
    return spec @ mel.T


def power_to_db(x, ref_value=1.0, amin=1e-10, top_db=None):
    db = 10.0 * np.log10(np.maximum(x, amin))
    db -= 10.0 * np.log10(max(ref_value, amin))
    if top_db is not None:
        db = np.maximum(db, db.max() - top_db)
    return db


def dct_ortho(n_mfcc, n_mels):
    n = np.arange(n_mels, dtype=np.float64)[:, None]
    k = np.arange(n_mfcc, dtype=np.float64)[None, :]
    mat = np.cos(math.pi * (2 * n + 1) * k / (2 * n_mels)) \
        * math.sqrt(2.0 / n_mels)
    mat[:, 0] = math.sqrt(1.0 / n_mels)
    return mat


def make_wave():
    """Deterministic 1.0 s test signal: two tones + seeded noise.
    Stored inside the npz so the test consumes the exact same samples."""
    rng = np.random.RandomState(20260816)
    t = np.arange(SR) / SR
    sig = (0.35 * np.sin(2 * np.pi * 220.0 * t)
           + 0.15 * np.sin(2 * np.pi * 1333.0 * t + 0.7)
           + 0.03 * rng.randn(SR))
    return sig.astype(np.float32)


def main():
    wave = make_wave()
    w64 = wave.astype(np.float64)

    out = {"wave": wave}
    out["fbank_80"] = kaldi_fbank_torch(w64, num_mel_bins=80)
    out["fbank_23"] = kaldi_fbank_torch(w64, num_mel_bins=23)
    out["fbank_40_nopre"] = kaldi_fbank_torch(
        w64, num_mel_bins=40, preemphasis_coefficient=0.0,
        remove_dc_offset=False)
    out["fbank_40_linear"] = kaldi_fbank_torch(
        w64, num_mel_bins=40, use_power=False)
    # the reference's method_args passthrough option surface
    out["fbank_40_nosnip"] = kaldi_fbank_torch(
        w64, num_mel_bins=40, snip_edges=False)
    out["fbank_40_energy"] = kaldi_fbank_torch(
        w64, num_mel_bins=40, use_energy=True)
    out["fbank_40_energy_win"] = kaldi_fbank_torch(
        w64, num_mel_bins=40, use_energy=True, raw_energy=False,
        energy_floor=0.0)
    out["fbank_40_energy_htk"] = kaldi_fbank_torch(
        w64, num_mel_bins=40, use_energy=True, htk_compat=True)
    out["fbank_40_vtln_0p9"] = kaldi_fbank_torch(
        w64, num_mel_bins=40, vtln_warp=0.9)
    out["fbank_40_vtln_1p1"] = kaldi_fbank_torch(
        w64, num_mel_bins=40, vtln_warp=1.1)
    out["kaldi_bank_40_512_vtln_0p9"] = kaldi_mel_banks_torch(
        40, 512, SR, vtln_warp=0.9).numpy()
    out["spectrogram_mag"] = stft_torch(w64, n_fft=512, power=1.0)
    out["mel_64"] = mel_spectrogram_torch(w64, n_mels=64)
    logmel_128 = power_to_db(mel_spectrogram_torch(w64, n_mels=128))
    out["logmel_128"] = logmel_128
    logmel_64 = power_to_db(mel_spectrogram_torch(w64, n_mels=64))
    out["mfcc_40"] = logmel_64 @ dct_ortho(40, 64)
    # frozen mel-bank matrices (geometry check independent of the signal)
    out["kaldi_bank_80_512"] = kaldi_mel_banks_torch(80, 512, SR).numpy()
    out["slaney_bank_64_512"] = slaney_mel_matrix_torch(SR, 512, 64)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}:")
    for k, v in out.items():
        print(f"  {k}: {np.asarray(v).shape} {np.asarray(v).dtype}")


if __name__ == "__main__":
    main()
