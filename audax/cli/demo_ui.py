"""Browser demo: record/upload audio, compare original vs fine-tuned Whisper.

Rebuilds the reference's Streamlit app (AB/UI/Asmo.py: recorder, "Evaluate
Whisper / Finetune" buttons, add-to-dataset, finetune trigger, model swap)
as a dependency-free stdlib HTTP server — streamlit is not in this image,
and a framework serving surface shouldn't require it.

Run:  python -m audax.cli.main demo --size tiny [--ckpt ...] [--ft-ckpt ...]
Then open http://localhost:8501
"""

from __future__ import annotations

import glob
import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from audax.core.logging import get_logger

log = get_logger("audax.demo")

_PAGE = """<!DOCTYPE html>
<html><head><title>audax demo</title><style>
body { font-family: system-ui, sans-serif; max-width: 760px; margin: 2rem auto;
       background: #12121a; color: #eee; }
h1 { background: linear-gradient(90deg,#7dd,#d7a); -webkit-background-clip: text;
     color: transparent; }
button { background:#2a2a3a; color:#eee; border:1px solid #557; padding:.6rem 1.2rem;
         border-radius:8px; margin:.3rem; cursor:pointer; font-size:1rem; }
button:hover { background:#3a3a52; }
.card { background:#1a1a26; border-radius:12px; padding:1rem; margin:1rem 0; }
.result { white-space:pre-wrap; font-family:monospace; color:#9fd; }
</style></head><body>
<h1>audax &mdash; whisper demo</h1>
<div class="card">
  <button id="rec">&#9679; Record</button>
  <button id="stop" disabled>&#9632; Stop</button>
  <input type="file" id="file" accept=".wav">
  <span id="status"></span>
</div>
<div class="card">
  <button onclick="transcribe('original')">Evaluate Whisper</button>
  <button onclick="transcribe('finetuned')">Evaluate Finetune</button>
  <button onclick="addToDataset()">Add to dataset</button>
  <input type="text" id="label" placeholder="transcript for dataset"
         style="background:#2a2a3a;color:#eee;border:1px solid #557;
                border-radius:8px;padding:.5rem">
</div>
<div class="card">
  <button onclick="finetune()">Finetune</button>
  <button onclick="swapModel()">Swap model</button>
  <span id="ftstatus"></span>
  <div id="out" class="result"></div>
</div>
<script>
let audioBlob = null, mediaRecorder = null, chunks = [];
const status = (m) => document.getElementById('status').textContent = m;
document.getElementById('rec').onclick = async () => {
  const stream = await navigator.mediaDevices.getUserMedia({audio: true});
  mediaRecorder = new MediaRecorder(stream);
  chunks = [];
  mediaRecorder.ondataavailable = (e) => chunks.push(e.data);
  mediaRecorder.onstop = () => { audioBlob = new Blob(chunks); status('recorded'); };
  mediaRecorder.start();
  document.getElementById('stop').disabled = false;
  status('recording...');
};
document.getElementById('stop').onclick = () => mediaRecorder && mediaRecorder.stop();
document.getElementById('file').onchange = (e) => {
  audioBlob = e.target.files[0]; status('file loaded');
};
async function post(path) {
  if (!audioBlob) { status('no audio'); return null; }
  const res = await fetch(path, {method: 'POST', body: audioBlob});
  return await res.json();
}
async function transcribe(model) {
  document.getElementById('out').textContent = '...';
  const r = await post('/transcribe?model=' + model);
  if (r) document.getElementById('out').textContent =
    (model === 'original' ? 'whisper: ' : 'finetune: ') + r.text +
    '\\n(rtf ' + r.rtf + ')';
}
async function addToDataset() {
  const label = encodeURIComponent(document.getElementById('label').value);
  const r = await post('/add?text=' + label);
  if (r) status('saved as ' + r.file);
}
const ftstatus = (m) => document.getElementById('ftstatus').textContent = m;
async function finetune() {
  ftstatus('starting...');
  const res = await fetch('/finetune', {method: 'POST'});
  const r = await res.json();
  if (r.error) { ftstatus(r.error); return; }
  const poll = setInterval(async () => {
    const s = await (await fetch('/status')).json();
    ftstatus('finetune: ' + s.state +
             (s.loss != null ? ' (loss ' + s.loss + ')' : ''));
    if (s.state === 'done' || s.state === 'failed') clearInterval(poll);
  }, 1000);
}
async function swapModel() {
  const res = await fetch('/swap', {method: 'POST'});
  const r = await res.json();
  ftstatus(r.error || ('serving: ' + r.serving));
}
</script></body></html>
"""


class DemoState:
    def __init__(self, transcriber, ft_transcriber=None,
                 dataset_dir: str = "artifacts/demo_dataset",
                 ft_steps: int = 50, ft_lora_rank: int = 4):
        self.transcriber = transcriber
        self.ft_transcriber = ft_transcriber or transcriber
        self.dataset_dir = dataset_dir
        # resume numbering past existing samples: a fresh counter would
        # silently overwrite sample_0000.wav collected in earlier sessions
        existing = (glob.glob(os.path.join(dataset_dir, "sample_*.wav"))
                    if os.path.isdir(dataset_dir) else [])
        nums = []
        for p in existing:
            m = re.search(r"sample_(\d+)\.wav$", p)
            if m:
                nums.append(int(m.group(1)))
        self.counter = max(nums) + 1 if nums else 0
        self.lock = threading.Lock()
        # background fine-tune over the add-to-dataset corpus (the
        # reference UI's "Finetune" button, AB/UI/Asmo.py:152-166; its
        # training defaults come from AB/fineTune.py:162-183)
        self.ft_steps = ft_steps
        self.ft_lora_rank = ft_lora_rank
        self.job_state = "idle"          # idle | running | done | failed
        self.job_loss: Optional[float] = None
        self.job_error = ""
        self.pending_params = None       # finished weights awaiting /swap
        self.serving = "base"            # which weights /transcribe?finetuned uses
        self._job_thread: Optional[threading.Thread] = None

    def start_finetune(self) -> Optional[str]:
        """Kick a background LoRA fine-tune over dataset_dir; returns an
        error message or None. Labels come from the .txt sidecars written
        by /add?text=... (the reference records one invented word and
        fine-tunes on it, AB/fineTune.py:66-95)."""
        with self.lock:
            if self.job_state == "running":
                return "finetune already running"
            self.job_state = "running"
            self.job_loss = None
            self.job_error = ""

        def run():
            try:
                from audax.core.config import FineTuneConfig, MelConfig
                from audax.train.finetune_loop import (build_speech_dataset,
                                                       finetune_whisper)
                tr = self.transcriber
                mel_cfg = MelConfig.whisper(tr.cfg.n_mels)
                examples = build_speech_dataset(
                    self.dataset_dir, tr.tokenizer, mel_cfg,
                    chunk_seconds=tr.chunk_seconds)
                if not examples:
                    raise RuntimeError(
                        "dataset empty — record audio, type a transcript, "
                        "and 'Add to dataset' first")
                ft = FineTuneConfig(
                    learning_rate=1e-3 if self.ft_lora_rank else 1e-5,
                    warmup_steps=5, max_steps=self.ft_steps,
                    eval_every=10 ** 9,          # WER eval = /swap + evaluate
                    batch_size=8, lora_rank=self.ft_lora_rank)
                state, history = finetune_whisper(
                    tr.params, tr.cfg, tr.tokenizer, examples, ft,
                    mel_cfg=mel_cfg)
                with self.lock:
                    self.pending_params = state.model_params()
                    self.job_loss = round(history["loss"][-1], 4)
                    self.job_state = "done"
            except Exception as e:  # surfaced via /status, not a dead thread
                log.warning("demo finetune failed: %s", e)
                with self.lock:
                    self.job_error = str(e)
                    self.job_state = "failed"

        self._job_thread = threading.Thread(target=run, daemon=True)
        self._job_thread.start()
        return None

    def swap(self) -> Optional[str]:
        """Serve the latest fine-tuned weights on the 'finetuned' slot
        (the reference UI's "Swap model" button)."""
        from audax.infer.transcribe import Transcriber
        with self.lock:
            if self.pending_params is None:
                return "no finished finetune to swap in"
            params = self.pending_params
            tr = self.transcriber
        # same decode policy as the base slot — a different fallback/beam
        # setting here would misattribute decode-policy differences to
        # the fine-tune in the UI's side-by-side comparison
        new_tr = Transcriber(params, tr.cfg, tr.tokenizer,
                             lang=tr.lang, task=tr.task,
                             max_new_tokens=tr.max_new_tokens,
                             chunk_seconds=tr.chunk_seconds,
                             temperature_fallback=tr.temperature_fallback,
                             temperatures=tr.temperatures,
                             beam_width=tr.beam_width,
                             dtype=tr.dtype)
        with self.lock:
            self.ft_transcriber = new_tr
            self.serving = "finetuned"
        return None


def _decode_audio(body: bytes) -> Optional[np.ndarray]:
    """Accept WAV uploads directly; browser-recorded webm/ogg/m4a goes
    through the in-process C++ decode module (native lavc link), with the
    ffmpeg binary as a last resort (the reference leaned on ffmpeg for all
    of this, AB/memoToWav.py)."""
    from audax.data.audio_io import read_wav, resample, to_mono
    import subprocess
    import tempfile

    if body[:4] == b"RIFF":
        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as fh:
            fh.write(body)
            path = fh.name
        try:
            x, rate = read_wav(path)
        except Exception:          # truncated/corrupt RIFF: 400, not a 500
            return None
        finally:
            os.unlink(path)
    else:
        with tempfile.NamedTemporaryFile(suffix=".webm", delete=False) as fh:
            fh.write(body)
            src = fh.name
        dst = src + ".wav"
        try:
            try:
                from audax.native.bindings import decode_audio_file
                x, rate = decode_audio_file(src)
            except Exception:
                subprocess.run(["ffmpeg", "-y", "-i", src, "-ar", "16000",
                                "-ac", "1", dst], check=True,
                               capture_output=True)
                x, rate = read_wav(dst)
        except (FileNotFoundError, subprocess.CalledProcessError):
            return None
        finally:
            os.unlink(src)
            if os.path.exists(dst):
                os.unlink(dst)
    x = to_mono(x)
    if rate != 16000:
        x = resample(x, rate, 16000)
    return x


def make_handler(state: DemoState):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/status"):
                with state.lock:
                    self._json({"state": state.job_state,
                                "loss": state.job_loss,
                                "error": state.job_error,
                                "serving": state.serving})
                return
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            # control endpoints take no audio body
            if self.path.startswith("/finetune"):
                err = state.start_finetune()
                self._json({"error": err} if err else {"state": "running"},
                           409 if err else 200)
                return
            if self.path.startswith("/swap"):
                err = state.swap()
                self._json({"error": err} if err else
                           {"serving": state.serving}, 409 if err else 200)
                return
            audio = _decode_audio(body)
            if audio is None:
                self._json({"error": "could not decode audio "
                            "(upload WAV or install ffmpeg)"}, 400)
                return
            if self.path.startswith("/transcribe"):
                model = "finetuned" if "finetuned" in self.path else "original"
                tr = (state.ft_transcriber if model == "finetuned"
                      else state.transcriber)
                with state.lock:
                    result = tr.transcribe(audio)
                self._json({"text": result.text, "rtf": round(result.rtf, 3)})
            elif self.path.startswith("/add"):
                from urllib.parse import parse_qs, urlparse
                from audax.data.audio_io import write_wav
                os.makedirs(state.dataset_dir, exist_ok=True)
                with state.lock:
                    name = f"sample_{state.counter:04d}.wav"
                    state.counter += 1
                write_wav(os.path.join(state.dataset_dir, name), audio, 16000)
                # transcript sidecar: the label the /finetune corpus trains
                # on (build_speech_dataset's per-file .txt contract)
                q = parse_qs(urlparse(self.path).query)   # percent-decodes
                text = q.get("text", [""])[0].strip()
                if text:
                    side = os.path.splitext(name)[0] + ".txt"
                    with open(os.path.join(state.dataset_dir, side),
                              "w", encoding="utf-8") as fh:
                        fh.write(text + "\n")
                self._json({"file": name})
            else:
                self._json({"error": "unknown endpoint"}, 404)

        def log_message(self, *args):  # quiet
            pass

    return Handler


def serve(transcriber, ft_transcriber=None, *, port: int = 8501,
          host: str = "127.0.0.1",
          dataset_dir: str = "artifacts/demo_dataset",
          ft_steps: int = 50,
          ft_lora_rank: int = 4) -> ThreadingHTTPServer:
    # loopback by default like every other server in the repo: the demo
    # accepts arbitrary uploads and writes to disk — exposing it is an
    # explicit --host 0.0.0.0 decision, not the default
    state = DemoState(transcriber, ft_transcriber, dataset_dir,
                      ft_steps=ft_steps, ft_lora_rank=ft_lora_rank)
    server = ThreadingHTTPServer((host, port), make_handler(state))
    server.demo_state = state
    log.success("demo UI at http://%s:%d", host, port)
    return server
