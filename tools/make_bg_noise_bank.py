"""Generate the packaged background-noise bank.

The reference bundles office-ambience mp3s (reference
src/whisper_finetune/model/bg_noise/*.mp3) for AddBackgroundNoise. This image
has no network (no CC0 downloads) and no mp3 decoder, so the bank is
procedurally synthesized office ambience — deterministic (fixed seed),
committed as 16kHz mono int16 wavs under whisper_finetune_tpu/assets/bg_noise,
and loaded by default by get_audio_augments_advanced. Re-run this script to
regenerate identical files.
"""

import os

import numpy as np
from scipy.io import wavfile
from scipy.signal import butter, lfilter

SR = 16000
DUR = 10.0
N = int(SR * DUR)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "whisper_finetune_tpu", "assets", "bg_noise",
)


def _norm(x):
    x = x - x.mean()
    return x / (np.abs(x).max() + 1e-9) * 0.9


def _colored(rng, alpha, n=N):
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
    return np.fft.irfft(spec / freqs ** alpha, n=n)


def _lowpass(x, cutoff, order=4):
    b, a = butter(order, cutoff / (SR / 2), btype="low")
    return lfilter(b, a, x)


def _bandpass(x, lo, hi, order=2):
    b, a = butter(order, [lo / (SR / 2), hi / (SR / 2)], btype="band")
    return lfilter(b, a, x)


def hvac_hum(rng):
    t = np.arange(N) / SR
    hum = sum(
        a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        for f, a in [(50, 1.0), (100, 0.5), (150, 0.25), (200, 0.12)]
    )
    rumble = _lowpass(_colored(rng, 1.8), 300)
    sway = 1.0 + 0.15 * np.sin(2 * np.pi * 0.07 * t + 1.0)
    return _norm((0.5 * hum + 2.0 * rumble) * sway)


def keyboard_typing(rng):
    base = 0.05 * _colored(rng, 1.0)
    x = base.copy()
    pos = 0
    while pos < N - SR // 4:
        pos += int(rng.gamma(2.0, SR * 0.06))  # inter-key intervals
        if pos >= N - 400:
            break
        click_len = int(rng.uniform(0.004, 0.012) * SR)
        click = rng.standard_normal(click_len) * np.exp(
            -np.arange(click_len) / (click_len / 4)
        )
        x[pos:pos + click_len] += rng.uniform(0.4, 1.0) * _bandpass(
            click, 800, 6000
        )
        if rng.uniform() < 0.15:
            pos += int(SR * rng.uniform(0.5, 2.0))  # typing pauses
    return _norm(x)


def office_babble(rng):
    x = np.zeros(N)
    t = np.arange(N) / SR
    for _ in range(6):  # overlapping speech-shaped "voices"
        voice = _bandpass(_colored(rng, 0.8), 120, 2200)
        syllabic = np.clip(
            0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(3, 5) * t
                               + rng.uniform(0, 6.28))
            + 0.3 * np.sin(2 * np.pi * rng.uniform(0.2, 0.5) * t), 0, 1,
        ) ** 2
        x += voice * syllabic * rng.uniform(0.3, 1.0)
    return _norm(x)


def street_through_window(rng):
    t = np.arange(N) / SR
    base = _lowpass(_colored(rng, 1.5), 900)
    swells = 1.0 + 0.6 * np.clip(
        np.sin(2 * np.pi * 0.11 * t) + 0.5 * np.sin(2 * np.pi * 0.043 * t + 2), -1, 1
    )
    return _norm(base * swells)


def printer_fan(rng):
    t = np.arange(N) / SR
    whir = sum(
        a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
        for f, a in [(120, 0.7), (240, 0.4), (363, 0.3), (487, 0.2)]
    )
    mech = _bandpass(_colored(rng, 0.5), 300, 4000) * (
        0.6 + 0.4 * np.sin(2 * np.pi * 7.3 * t) ** 2
    )
    return _norm(0.4 * whir + mech)


def room_tone(rng):
    x = 0.8 * _colored(rng, 1.0)
    # occasional creaks/knocks
    for _ in range(8):
        pos = int(rng.uniform(0, N - SR // 2))
        ln = int(rng.uniform(0.05, 0.2) * SR)
        burst = _bandpass(
            rng.standard_normal(ln) * np.exp(-np.arange(ln) / (ln / 3)), 150, 1200
        )
        x[pos:pos + ln] += rng.uniform(0.5, 1.5) * burst
    return _norm(x)


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260817)
    for name, fn in [
        ("hvac_hum", hvac_hum),
        ("keyboard_typing", keyboard_typing),
        ("office_babble", office_babble),
        ("street_through_window", street_through_window),
        ("printer_fan", printer_fan),
        ("room_tone", room_tone),
    ]:
        data = (fn(rng) * 32767).astype(np.int16)
        path = os.path.join(OUT, f"{name}.wav")
        wavfile.write(path, SR, data)
        print(f"wrote {path} ({os.path.getsize(path) // 1024} KiB)")


if __name__ == "__main__":
    main()
