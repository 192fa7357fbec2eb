"""Out-of-HBM audio streaming: host-resident log-STFTs, device-resident poses.

The HBM-resident design (datasets.py / loader.py) is the right TPU answer for
splits that fit device memory, but the big SoundSpaces scenes do not: on a
16 GB v5e, apartment_1's train split alone is ~23 GB of log-STFT (see
docs/DATA.md for the per-scene table). The reference streams any size from
disk through a torch DataLoader (NeRAF_datamanager.py:84-133); this module is
the TPU-native equivalent:

- the (N, C, F, T) log-STFT array stays in HOST memory (a plain ndarray or a
  np.memmap — anything indexable),
- the tiny pose tables (3 x (N,3)) stay device-resident, gathered in-jit by
  recording index,
- a background producer thread draws (recording, time_bin) indices with a
  numpy RNG and gathers the (B, C, F) column batch host-side (numpy releases
  the GIL for the copy),
- the TRAINING thread is the only thread that touches the device (the axon
  jax client aborts on concurrent dispatch from a second host thread):
  `next()` returns the batch whose transfer was started on the PREVIOUS call
  and immediately starts the async `jax.device_put` of the following one, so
  the ~4 MB host->device copy overlaps the jitted step that consumes the
  returned batch.

A streamed batch is consumed by the same jitted step as the HBM path via
`loader.resolve_audio_batch` — the two input structures differ (pre-gathered
"data" vs whole-split "log_stft"), which jit resolves at trace time.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

import jax
import jax.numpy as jnp


def split_device_bytes(log_stft) -> int:
    """Device bytes the HBM-resident path would commit for this split."""
    return int(np.prod(log_stft.shape)) * log_stft.dtype.itemsize


def write_time_major_store(log_stft, path, block: int = 256) -> np.memmap:
    """One-time (N,C,F,T) -> (N,T,C,F) transposed disk store for streaming.

    The streaming gather reads one (C,F) column per sample; in the natural
    (N,C,F,T) layout those C*F elements are strided T floats apart, so a
    cold-page gather touches EVERY page of the 160 KB recording row (~80x
    the useful bytes — docs/DATA.md measured 1.5 steps/s from a cold store).
    A time-major store makes each column one contiguous C*F*4-byte read.
    Sequential one-time transpose, block rows at a time.
    """
    n = log_stft.shape[0]
    tm_shape = (n, log_stft.shape[3], log_stft.shape[1], log_stft.shape[2])
    mm = np.memmap(path, np.float32, "w+", shape=tm_shape)
    for i in range(0, n, block):
        mm[i:i + block] = np.asarray(
            log_stft[i:i + block]).transpose(0, 3, 1, 2)
    mm.flush()
    return np.memmap(path, np.float32, "r", shape=tm_shape)


def should_stream(audio_cfg, dataset) -> bool:
    """Pick the data path per config: "on" / "off" / "auto" (size-based).

    Auto streams when the split's log-STFT exceeds `stream_threshold_gb` —
    the HBM budget must also hold params, optimizer states, the 128^3 grid,
    and ResNet activations, so the threshold sits well below physical HBM.
    """
    mode = getattr(audio_cfg, "streaming", "auto")
    if mode == "on":
        return True
    if mode == "off":
        return False
    threshold = float(getattr(audio_cfg, "stream_threshold_gb", 8.0))
    return split_device_bytes(dataset.log_stft) > threshold * 2**30


class StreamingAudioSampler:
    """Double-buffered host->device STFT-column batch streamer.

    Usage (training thread):
        sampler = StreamingAudioSampler(dataset, batch_size)
        for _ in range(steps):
            state, m = pipe.train_step(state, cams, sampler.next(), imgs)
        sampler.stop()
    """

    def __init__(self, dataset, batch_size: int, max_len: int | None = None,
                 seed: int = 0, prefetch: int = 3,
                 transfer_dtype: str = "float32",
                 time_major: bool | str = "auto", layout: str = "cft",
                 inflight: int = 2):
        self.log_stft = dataset.log_stft  # HOST (N, C, F, T); may be memmap
        # Gather layout: the hot op is "one (C,F) column per sample", so the
        # store SHOULD be time-major (N,T,C,F) — each column is then one
        # contiguous C*F*4-byte read instead of C*F elements strided T
        # floats apart across the whole 160 KB recording row.
        #   layout="tcf": caller already hands a time-major store (e.g. from
        #     write_time_major_store); used as-is.
        #   time_major=True/"auto": in-RAM ndarray stores are transposed
        #     once at init ("auto" skips memmaps — transposing those would
        #     pull the whole out-of-core store through RAM; use
        #     write_time_major_store for a persistent transposed copy).
        self._tm = layout == "tcf"
        if self._tm:
            self.log_stft = dataset.log_stft
        elif time_major is True or (
                time_major == "auto"
                and type(self.log_stft) is np.ndarray):
            self.log_stft = np.ascontiguousarray(
                np.asarray(self.log_stft).transpose(0, 3, 1, 2))
            self._tm = True
        # transfer_dtype="bfloat16" halves host->device bytes per batch
        # (~4.2 MB -> 2.1 MB at the 2048x2x257 geometry) at a <=2^-8
        # relative quantization of the log-magnitudes; the jitted step
        # upcasts on device. Useful when the transfer link (the axon
        # tunnel here; PCIe on a real host) bounds streaming throughput.
        if transfer_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported transfer_dtype {transfer_dtype!r}")
        self._transfer_np_dtype = (
            np.float32 if transfer_dtype == "float32"
            else __import__("ml_dtypes").bfloat16)
        o = dataset.outputs
        # pose tables are tiny ((N,3) fp32) and live on device for in-jit
        # gathering by recording index
        self.pose_tables = {
            "mic_pose": jnp.asarray(o.microphone_poses, jnp.float32),
            "source_pose": jnp.asarray(o.source_poses, jnp.float32),
            "rot": jnp.asarray(o.rotations, jnp.float32),
        }
        self.batch_size = batch_size
        self.max_len = int(max_len if max_len is not None else dataset.max_len)
        self._rng = np.random.default_rng(seed)
        self._host_q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._stopped = threading.Event()
        self._error: BaseException | None = None
        # device batches whose async transfers have been started, oldest
        # first; depth >1 keeps a transfer in flight even while the step
        # that consumes the previous batch is still enqueuing, which hides
        # the host->device copy latency (the axon tunnel's ~4 MB transfer
        # is comparable to a whole train step) behind TWO steps instead of
        # the tail of one.
        self._inflight_max = max(1, int(inflight))
        self._inflight: list = []
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ producer
    def _draw_host_batch(self) -> dict:
        n_rec = self.log_stft.shape[0]
        idx = self._rng.integers(0, n_rec * self.max_len, self.batch_size)
        rec = (idx // self.max_len).astype(np.int32)
        t = (idx % self.max_len).astype(np.int32)
        # same gather semantics as the in-jit path
        # (loader.gather_audio_batch: log_stft[rec, :, :, t] -> (B, C, F));
        # gather in sorted-index order for page locality (memmap stores),
        # then unsort — the batch an index targets must not change.
        order = np.lexsort((t, rec))
        inv = np.argsort(order)
        if self._tm:
            data = np.ascontiguousarray(
                self.log_stft[rec[order], t[order]][inv])
        else:
            data = np.ascontiguousarray(
                self.log_stft[rec[order], :, :, t[order]][inv])
        if data.dtype != self._transfer_np_dtype:
            data = data.astype(self._transfer_np_dtype)
        return {"audio_idx": rec, "time_query": t, "data": data}

    def _producer(self):
        try:
            while not self._stopped.is_set():
                batch = self._draw_host_batch()
                while not self._stopped.is_set():
                    try:
                        self._host_q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced by next(); never deadlock it
            self._error = e

    def _get_host_batch(self, block: bool) -> dict | None:
        while True:
            try:
                return self._host_q.get(timeout=1.0) if block \
                    else self._host_q.get_nowait()
            except queue.Empty:
                if self._error is not None:
                    raise RuntimeError(
                        "streaming producer thread died") from self._error
                if not block:
                    return None

    # ------------------------------------------------------------ consumer
    def _start_transfer(self, host_batch: dict) -> dict:
        # async device_put: returns immediately, the copy overlaps whatever
        # the device is executing. MUST be called from the training thread.
        dev = {k: jax.device_put(v) for k, v in host_batch.items()}
        dev.update(self.pose_tables)
        return dev

    def next(self) -> dict:
        """The next streamed audio input dict (training thread only).

        Structure matches loader.resolve_audio_batch's streaming form:
        pose tables (N,3) + pre-gathered data (B,C,F) + indices (B,).
        """
        if not self._inflight:
            self._inflight.append(
                self._start_transfer(self._get_host_batch(True)))
        out = self._inflight.pop(0)
        # top the transfer pipeline back up to `inflight` depth before
        # returning, so upcoming batches' copies overlap the step that
        # consumes `out` (and the one after); if the producer is behind,
        # skip — a later call will block on the queue instead
        while len(self._inflight) < self._inflight_max:
            nb = self._get_host_batch(False)
            if nb is None:
                break
            self._inflight.append(self._start_transfer(nb))
        return out

    def stop(self):
        self._stopped.set()
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
