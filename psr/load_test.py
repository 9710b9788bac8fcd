"""Self-pacing load test for the TTS server (stdlib-only Locust equivalent).

Usage:
    python psr/load_test.py --host http://localhost:8000 --users 10 --minutes 2

Mirrors the reference PSR profile (reference: psr/load_test.py): each
simulated user POSTs a random multilingual sample (including a voice-mix
request), then sleeps for the duration of the audio it received — i.e.
users speak, listen, repeat — and a concurrency gauge reports how many
requests are in flight.  Reports p50/p95 latency, RTF, and throughput.
"""

from __future__ import annotations

import argparse
import json
import random
import threading
import time
import urllib.request

SAMPLES = [
    ("Hello there, how are you doing today?", "0"),
    ("The quick brown fox jumps over the lazy dog.", "1"),
    ("Ce matin, le ciel est clair et le vent est doux.", "8"),
    ("Buongiorno, come stai oggi?", "13"),
    ("This is a longer sentence intended to produce several seconds of audio output.", "2"),
    ("Would you like some coffee?", "0(50)+1(50)"),
]

SAMPLE_RATE = 24000

# --ids mode: pretokenized phoneme-ID requests for hosts without eSpeak
# (lengths mirror the text samples; ids are valid vocab, incl. a voice mix)
def _ids_sample(rng: random.Random, n: int) -> list[int]:
    return [rng.randrange(1, 600) for _ in range(n)]


ID_LENGTHS = [(24, "0"), (46, "1"), (52, "8"), (30, "13"), (110, "2"), (20, "0(50)+1(50)")]


class Stats:
    def __init__(self):
        self.lock = threading.Lock()
        self.latencies: list[float] = []
        self.audio_seconds: list[float] = []
        self.errors = 0
        self.in_flight = 0
        self.max_in_flight = 0

    def start_request(self):
        with self.lock:
            self.in_flight += 1
            self.max_in_flight = max(self.max_in_flight, self.in_flight)

    def end_request(self, latency: float | None, audio_sec: float):
        with self.lock:
            self.in_flight -= 1
            if latency is None:
                self.errors += 1
            else:
                self.latencies.append(latency)
                self.audio_seconds.append(audio_sec)


def user_loop(
    host: str,
    stats: Stats,
    stop: threading.Event,
    seed: int,
    use_ids: bool = False,
    speed: float | None = None,
):
    rng = random.Random(seed)
    while not stop.is_set():
        if use_ids:
            n, voice = rng.choice(ID_LENGTHS)
            payload = {
                "phoneme_ids": _ids_sample(rng, n),
                "voice": voice,
                "response_format": "pcm",
            }
        else:
            text, voice = rng.choice(SAMPLES)
            payload = {"input": text, "voice": voice, "response_format": "pcm"}
        if speed is not None:
            payload["speed"] = speed
        body = json.dumps(payload).encode()
        req = urllib.request.Request(
            f"{host}/v1/audio/speech",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        stats.start_request()
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                audio = resp.read()
            latency = time.perf_counter() - t0
            audio_sec = len(audio) / 2 / SAMPLE_RATE
            stats.end_request(latency, audio_sec)
            # self-pacing: "listen" to the audio before speaking again
            stop.wait(audio_sec)
        except Exception:
            stats.end_request(None, 0.0)
            stop.wait(1.0)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="http://localhost:8000")
    parser.add_argument("--users", type=int, default=10)
    parser.add_argument("--minutes", type=float, default=1.0)
    parser.add_argument(
        "--ids", action="store_true",
        help="POST pretokenized phoneme_ids (for hosts without eSpeak)",
    )
    parser.add_argument("--speed", type=float, default=None)
    args = parser.parse_args(argv)

    stats = Stats()
    stop = threading.Event()
    threads = [
        threading.Thread(
            target=user_loop,
            args=(args.host, stats, stop, i, args.ids, args.speed),
            daemon=True,
        )
        for i in range(args.users)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    try:
        time.sleep(args.minutes * 60)
    finally:
        stop.set()
    for t in threads:
        t.join(timeout=5)

    elapsed = time.time() - t0
    lats = sorted(stats.latencies)
    if not lats:
        print("no successful requests")
        return
    total_audio = sum(stats.audio_seconds)
    p = lambda q: lats[min(int(q * len(lats)), len(lats) - 1)]
    print(f"requests: {len(lats)} ok, {stats.errors} errors in {elapsed:.0f}s")
    print(f"latency p50 {p(0.5)*1000:.0f}ms  p95 {p(0.95)*1000:.0f}ms  max {lats[-1]*1000:.0f}ms")
    print(f"audio generated: {total_audio:.1f}s  (service RTF {sum(lats)/max(total_audio,1e-9):.3f})")
    print(f"throughput: {len(lats)/elapsed:.2f} req/s,  max concurrency {stats.max_in_flight}")


if __name__ == "__main__":
    main()
