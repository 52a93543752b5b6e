"""REST batch-ASR server: endpoint contract over a live socket, concurrent
requests sharing one continuous-batching engine (slots < clients forces a
mid-decode refill), error paths."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from audax.cli.http_server import serve_http
from audax.core.config import WhisperConfig
from audax.data.audio_io import write_wav
from audax.infer.continuous import ContinuousBatcher
from audax.models.whisper import init_whisper_params
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def server():
    tok = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    cb = ContinuousBatcher(params, cfg, tok, slots=2, window_seconds=1.0,
                           max_new_tokens=6, steps_per_sync=4)
    srv = serve_http(cb, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, srv.server_address[1]
    srv.scheduler.shutdown()
    srv.shutdown()


def _url(port, path):
    return f"http://127.0.0.1:{port}{path}"


def test_healthz(server):
    _, port = server
    # generous timeout: first XLA compiles share a loaded box under -n 4
    with urllib.request.urlopen(_url(port, "/healthz"), timeout=300) as r:
        h = json.load(r)
    assert h["ok"] and h["live"] == 0


def test_concurrent_transcriptions_share_engine(server, rng, tmp_path):
    srv, port = server
    wav = tmp_path / "clip.wav"
    write_wav(str(wav), 0.01 * rng.standard_normal(16000).astype(np.float32),
              16000)
    body = wav.read_bytes()
    results, errors = {}, []

    def post(name):
        try:
            req = urllib.request.Request(
                _url(port, "/v1/audio/transcriptions?max_tokens=4"),
                data=body, method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                results[name] = json.load(r)
        except Exception as exc:  # noqa: BLE001 - surfaced via assert
            errors.append((name, exc))

    # 3 clients through 2 slots: the third request must be admitted by a
    # mid-decode slot refill inside the shared engine
    threads = [threading.Thread(target=post, args=(f"c{i}",))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert set(results) == {"c0", "c1", "c2"}
    for r in results.values():
        assert isinstance(r["text"], str)
        assert len(r["tokens"]) <= 4
        assert np.isfinite(r["avg_logprob"])
    # identical audio + greedy decode -> identical tokens for every client
    assert len({tuple(r["tokens"]) for r in results.values()}) == 1


def test_lang_param(server, rng, tmp_path):
    _, port = server
    wav = tmp_path / "lang.wav"
    write_wav(str(wav), 0.01 * rng.standard_normal(8000).astype(np.float32),
              16000)
    body = wav.read_bytes()
    req = urllib.request.Request(
        _url(port, "/v1/audio/transcriptions?max_tokens=3&lang=de"),
        data=body, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        assert "text" in json.load(r)
    with pytest.raises(urllib.error.HTTPError) as e:
        req = urllib.request.Request(
            _url(port, "/v1/audio/transcriptions?lang=zz"),
            data=body, method="POST")
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    assert "unknown language" in e.value.read().decode()


def test_metrics_endpoint(server, rng, tmp_path):
    """/metrics reports served counts and latency percentiles (serves one
    request itself — under xdist this test may run on a fresh worker)."""
    _, port = server
    wav = tmp_path / "m.wav"
    write_wav(str(wav), 0.01 * rng.standard_normal(8000).astype(np.float32),
              16000)
    req = urllib.request.Request(
        _url(port, "/v1/audio/transcriptions?max_tokens=2"),
        data=wav.read_bytes(), method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        json.load(r)
    with urllib.request.urlopen(_url(port, "/metrics"), timeout=60) as r:
        m = json.load(r)
    assert m["requests_served"] >= 1
    assert m["tokens_generated"] >= 1
    assert m["latency_s"]["p50"] is not None
    assert m["latency_s"]["p95"] >= m["latency_s"]["p50"]
    assert m["engine"]["decode_steps_enqueued"] >= 1
    assert m["uptime_s"] > 0


def test_long_audio_rejected_unless_truncate(server, rng, tmp_path):
    """Audio beyond the serving window 413s (no silent half-transcripts);
    ?truncate=1 opts into first-window-only."""
    _, port = server
    wav = tmp_path / "long.wav"                  # 2 s > 1 s window
    write_wav(str(wav), 0.01 * rng.standard_normal(32000).astype(np.float32),
              16000)
    body = wav.read_bytes()
    with pytest.raises(urllib.error.HTTPError) as e:
        req = urllib.request.Request(
            _url(port, "/v1/audio/transcriptions"), data=body,
            method="POST")
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 413
    assert "serving window" in e.value.read().decode()
    req = urllib.request.Request(
        _url(port, "/v1/audio/transcriptions?truncate=1&max_tokens=2"),
        data=body, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.load(r)
    assert out["audio_seconds"] == 1.0           # the window that ran


def test_scheduler_guards():
    """Unit-level Scheduler contracts (no engine needed): submit refuses
    when dead (503 path, not a hang-to-timeout), the in-flight cap raises
    ServerBusy (429 path), and already-delivered results survive scheduler
    death."""
    from audax.cli.http_server import Scheduler, SchedulerDown, ServerBusy

    class _Eng:
        slots = 2

        def live(self):
            return 0

        def pending(self):
            return 0

    s = Scheduler(_Eng(), max_inflight=2)       # never started: no thread
    s.submit(np.zeros(4, np.float32))
    s.submit(np.zeros(4, np.float32))
    with pytest.raises(ServerBusy):
        s.submit(np.zeros(4, np.float32))
    s.dead = "boom"
    with pytest.raises(SchedulerDown):
        s.submit(np.zeros(4, np.float32))
    # delivered results survive death sweeps: simulate run()'s handler
    s2 = Scheduler(_Eng())
    rid, ev = s2.submit(np.zeros(4, np.float32))
    with s2._cv:
        s2._results[rid] = "RESULT"
        s2._events.pop(rid)
        s2._submitted_at.pop(rid)
    ev.set()
    # death sweep must not clear it
    with s2._cv:
        s2.dead = "late failure"
        undelivered = {r: e for r, e in s2._events.items()
                       if r not in s2._results}
        for r in undelivered:
            s2._events.pop(r, None)
    assert s2.result(rid) == "RESULT"


def test_window_context_mismatch_fails_fast():
    """A window that doesn't match cfg.n_audio_ctx must raise at
    construction, not as a broadcast TypeError inside the first admit's
    jit on the scheduler thread."""
    tok = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    with pytest.raises(ValueError, match="n_audio_ctx"):
        ContinuousBatcher(params, cfg, tok, slots=2, window_seconds=2.0)


def test_error_paths(server):
    _, port = server
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(_url(port, "/nope"), timeout=60)
    assert e.value.code == 404
    # malformed Content-Length via a raw socket (urllib normalizes it):
    # must get a 400 JSON response, not a dropped connection
    import socket
    with socket.create_connection(("127.0.0.1", port), timeout=60) as sk:
        sk.sendall(b"POST /v1/audio/transcriptions HTTP/1.1\r\n"
                   b"Host: x\r\nContent-Length: abc\r\n\r\n")
        head = sk.recv(4096).decode(errors="replace")
    assert " 400 " in head.splitlines()[0], head
    with pytest.raises(urllib.error.HTTPError) as e:
        req = urllib.request.Request(
            _url(port, "/v1/audio/transcriptions"), data=b"", method="POST")
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        req = urllib.request.Request(
            _url(port, "/v1/audio/transcriptions"),
            data=b"not audio at all", method="POST")
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_response_format(server, rng, tmp_path):
    """OpenAI-style response_format: text/srt/vtt return rendered
    transcripts with text/plain content type; verbose_json carries a
    window-spanning segment; bad values 400."""
    _, port = server
    wav = tmp_path / "fmt.wav"
    write_wav(str(wav), 0.01 * rng.standard_normal(8000).astype(np.float32),
              16000)
    body = wav.read_bytes()

    def post(qs):
        req = urllib.request.Request(
            _url(port, "/v1/audio/transcriptions?max_tokens=3" + qs),
            data=body, method="POST")
        return urllib.request.urlopen(req, timeout=300)

    with post("&response_format=verbose_json") as r:
        v = json.load(r)
    assert v["task"] == "transcribe" and len(v["segments"]) == 1
    seg = v["segments"][0]
    assert seg["start"] == 0.0 and seg["end"] == pytest.approx(v["duration"])
    assert seg["text"] == v["text"]

    with post("&response_format=text") as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        txt = r.read().decode()
    assert txt.strip() == v["text"].strip()

    with post("&response_format=srt") as r:
        srt = r.read().decode()
    with post("&response_format=vtt") as r:
        vtt = r.read().decode()
    if v["text"].strip():                 # random weights may emit no text
        assert srt.startswith("1\n00:00:00,000 --> ")
        assert "00:00:00.000 --> " in vtt
    assert vtt.startswith("WEBVTT")

    with pytest.raises(urllib.error.HTTPError) as e:
        post("&response_format=yaml")
    assert e.value.code == 400
