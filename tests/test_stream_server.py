"""WebSocket streaming server: RFC 6455 handshake/frames + end-to-end
segments over a live socket (stdlib client, masked frames as the RFC
requires of clients)."""

import base64
import json
import os
import socket
import struct
import threading

import jax
import numpy as np
import pytest

from audax.cli.stream_server import (read_frame, serve_streaming,
                                     write_frame, ws_handshake_accept,
                                     OP_BINARY, OP_CLOSE, OP_TEXT)
from audax.core.config import WhisperConfig
from audax.infer.streaming import StreamingTranscriber
from audax.models.whisper import init_whisper_params
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer


def _client_send(sock, opcode, payload: bytes):
    """Client-side frame write (masked, as RFC 6455 requires)."""
    mask = os.urandom(4)
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    n = len(payload)
    header = bytes([0x80 | opcode])
    if n < 126:
        header += bytes([0x80 | n])
    elif n < (1 << 16):
        header += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        header += bytes([0x80 | 127]) + struct.pack(">Q", n)
    sock.sendall(header + mask + masked)


def _connect(port, stream_id):
    # generous timeout: under -n 4 the first XLA compile shares a
    # loaded box with three other workers
    sock = socket.create_connection(("127.0.0.1", port), timeout=180)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((
        f"GET /ws?stream={stream_id} HTTP/1.1\r\n"
        f"Host: 127.0.0.1:{port}\r\n"
        "Upgrade: websocket\r\nConnection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
    ).encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += sock.recv(4096)
    head = resp.decode("latin-1")
    assert "101" in head.split("\r\n")[0]
    assert ws_handshake_accept(key) in head
    return sock


def test_handshake_accept_rfc_vector():
    # the worked example from RFC 6455 §1.3
    assert ws_handshake_accept("dGhlIHNhbXBsZSBub25jZQ==") == \
        "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_streaming_over_websocket(rng):
    tok = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280),
                           timestamp_count=51)
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    st = StreamingTranscriber(params, cfg, tok, batch_slots=2,
                              window_seconds=1.0, max_new_tokens=6,
                              backend="xla")
    # pre-compile the batched step so socket reads don't race the compiler
    st.feed("warm", np.zeros(16000, np.float32))
    st.drain()
    server = serve_streaming(st, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        sock = _connect(port, "mic0")
        # 1.5 windows of audio: one full chunk finalizes immediately
        audio = (0.05 * rng.standard_normal(24000)).astype("<f4")
        _client_send(sock, OP_BINARY, audio.tobytes())
        op, payload = read_frame(sock)
        assert op == OP_TEXT
        seg = json.loads(payload)
        assert seg["stream"] == "mic0" and seg["index"] == 0
        assert seg["audio_seconds"] == pytest.approx(1.0)
        # flush emits the trailing half window as chunk 1
        _client_send(sock, OP_TEXT, b"flush")
        op, payload = read_frame(sock)
        seg2 = json.loads(payload)
        assert seg2["index"] == 1
        # clean close
        _client_send(sock, OP_CLOSE, struct.pack(">H", 1000))
        op, _ = read_frame(sock)
        assert op == OP_CLOSE
        sock.close()
    finally:
        server.shutdown()


def test_split_float32_across_messages(rng):
    """Regression (review finding): a float32 split across two separate
    binary MESSAGES (not RFC fragments) must be buffered byte-level, not
    raise ValueError and drop the connection; the reassembled audio still
    transcribes."""
    tok = WhisperTokenizer(train_bpe(["hello"] * 3, vocab_size=280),
                           timestamp_count=51)
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    st = StreamingTranscriber(params, cfg, tok, batch_slots=2,
                              window_seconds=1.0, max_new_tokens=6,
                              backend="xla")
    st.feed("warm", np.zeros(16000, np.float32))
    st.drain()
    server = serve_streaming(st, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        sock = _connect(port, "ragged")
        audio = (0.05 * rng.standard_normal(16000)).astype("<f4").tobytes()
        # split at a non-multiple-of-4 boundary across two MESSAGES
        _client_send(sock, OP_BINARY, audio[:6])
        _client_send(sock, OP_BINARY, audio[6:])
        op, payload = read_frame(sock)
        assert op == OP_TEXT
        seg = json.loads(payload)
        assert seg["stream"] == "ragged" and seg["index"] == 0
        _client_send(sock, OP_CLOSE, struct.pack(">H", 1000))
        sock.close()
    finally:
        server.shutdown()


def test_ping_between_fragments(rng):
    """A ping arriving between fragments of a binary message (legal per RFC
    6455 §5.4) must be answered with a pong and must NOT leak into the PCM
    payload."""
    tok = WhisperTokenizer(train_bpe(["hello"] * 3, vocab_size=280),
                           timestamp_count=51)
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    st = StreamingTranscriber(init_whisper_params(cfg, jax.random.key(0)),
                              cfg, tok, batch_slots=1, window_seconds=1.0,
                              max_new_tokens=4, backend="xla")
    st.feed("warm", np.zeros(16000, np.float32))
    st.drain()
    server = serve_streaming(st, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        sock = _connect(port, "frag")
        audio = (0.05 * rng.standard_normal(16000)).astype("<f4").tobytes()
        half = len(audio) // 2

        def send_raw(fin, opcode, payload):
            mask = os.urandom(4)
            masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
            n = len(payload)
            hdr = bytes([(0x80 if fin else 0) | opcode])
            if n < 126:
                hdr += bytes([0x80 | n])
            else:
                hdr += bytes([0x80 | 126]) + struct.pack(">H", n)
            sock.sendall(hdr + mask + masked)

        send_raw(False, 2, audio[:half])        # binary fragment 1 (no FIN)
        send_raw(True, 9, b"keepalive")         # ping in the middle
        send_raw(True, 0, audio[half:])         # continuation w/ FIN
        # pong arrives first (control handled inline), then the segment
        op, payload = read_frame(sock)
        assert op == 0xA and payload == b"keepalive"
        op, payload = read_frame(sock)
        assert op == OP_TEXT
        seg = json.loads(payload)
        assert seg["stream"] == "frag" and seg["index"] == 0
    finally:
        server.shutdown()
