"""Latent trajectory store: the state bus between inversion and composition.

The reference writes one ``ddim_latents_{t}.pt`` torch file per inversion
timestep (500 files, ~3.5 GB/video; reference:
pipeline_i2vgen_xl.py:1988-1996) and re-reads 1-3 of them from disk inside
every denoising step (pipeline_i2vgen_xl.py:1637-1670, utils.py:31-45).

TPU-native design: ONE container per video holding [steps, F, h, w, C] fp16
plus the timestep vector, written once after the inversion scan; the
composite pipeline gathers the (few) timesteps it needs into a single
device-resident array before the sampling scan — zero disk/host traffic
inside the hot loop.

Backends, in preference order:
  1. native mmap container (.mvoctraj) via the C++ codec
     (native/traj_codec.cpp): threaded fp16<->fp32 conversion, random-access
     step gathers without reading the rest of the file;
  2. numpy .npz (portable fallback);
  3. the reference's per-step ``.pt`` layout (read-only interop, via torch).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

STACK_NAME = "ddim_trajectory.npz"
NATIVE_NAME = "ddim_trajectory.mvoctraj"
META_NAME = "inversion_meta.json"


class TrajectoryStore:
    """Read/write interface for a single video's inversion trajectory.

    Latents are stored channels-last [F, h, w, C] per step (the framework's
    native layout).  Reference .pt files ([1, C, F, h, w]) are transposed on
    read.
    """

    def __init__(self, path: str, prefer_native: bool = True):
        self.path = path
        self.prefer_native = prefer_native
        self._stack: np.ndarray | None = None
        self._timesteps: np.ndarray | None = None
        self._native = None  # NativeTrajReader

    # -- write ------------------------------------------------------------

    def save(self, timesteps: Sequence[int], latents: np.ndarray,
             meta: dict | None = None) -> str:
        """latents: [steps, F, h, w, C]; timesteps[i] is the (noisier) t the
        i-th entry sits at (ascending for inversion output).  `meta` is a
        JSON-able dict of the producing config, written alongside so
        consumers can detect stale caches (content-addressed resume,
        SURVEY.md §5 checkpoint/resume)."""
        os.makedirs(self.path, exist_ok=True)
        if meta is not None:
            import json

            with open(os.path.join(self.path, META_NAME), "w") as f:
                json.dump(meta, f, indent=1, default=str)
        ts = np.asarray(timesteps, dtype=np.int32)
        if self.prefer_native:
            from mvoc_tpu.io import native

            out = os.path.join(self.path, NATIVE_NAME)
            if native.traj_write(out, ts, np.asarray(latents, dtype=np.float32)):
                return out
        out = os.path.join(self.path, STACK_NAME)
        np.savez(out, timesteps=ts, latents=latents.astype(np.float16))
        return out

    @property
    def meta(self) -> dict | None:
        import json

        p = os.path.join(self.path, META_NAME)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def matches_meta(self, expected: dict, missing_ok: bool = False) -> bool:
        """True when a cached trajectory was produced by `expected` (compared
        on the intersection of keys).  A missing meta file does NOT match by
        default: a store written without provenance (stale/foreign cache)
        must not silently satisfy a skip-if-cached check — stricter than the
        reference's path-only test (inverse.py:181-183).  Pass
        missing_ok=True for the legacy behavior."""
        got = self.meta
        if got is None:
            return missing_ok
        return all(str(got.get(k)) == str(v) for k, v in expected.items() if k in got)

    # -- read -------------------------------------------------------------

    def _open_native(self) -> bool:
        if self._native is not None:
            return True
        p = os.path.join(self.path, NATIVE_NAME)
        if not os.path.exists(p):
            return False
        try:
            from mvoc_tpu.io import native

            self._native = native.NativeTrajReader(p)
            return True
        except Exception:
            return False

    def _ensure_loaded(self) -> bool:
        if self._stack is not None:
            return True
        stack_path = os.path.join(self.path, STACK_NAME)
        if os.path.exists(stack_path):
            data = np.load(stack_path)
            self._stack = data["latents"]
            self._timesteps = data["timesteps"]
            return True
        return False

    @property
    def timesteps(self) -> np.ndarray:
        if self._open_native():
            return self._native.timesteps
        if self._ensure_loaded():
            return self._timesteps
        import re, glob

        ts = []
        for p in glob.glob(os.path.join(self.path, "ddim_latents_*.pt")):
            m = re.search(r"ddim_latents_(\d+)\.pt", os.path.basename(p))
            if m:
                ts.append(int(m.group(1)))
        if not ts:
            raise FileNotFoundError(f"no trajectory data in {self.path}")
        return np.asarray(sorted(ts), dtype=np.int32)

    def _indices_for(self, timesteps: Sequence[int]) -> np.ndarray:
        table = self.timesteps
        idx = []
        for t in timesteps:
            hits = np.nonzero(table == int(t))[0]
            if hits.size == 0:
                raise KeyError(
                    f"timestep {t} not in trajectory {self.path} "
                    f"(have {len(table)} steps {table.min()}..{table.max()})"
                )
            idx.append(int(hits[0]))
        return np.asarray(idx, dtype=np.uint32)

    def load_at_t(self, t: int) -> np.ndarray:
        """[F, h, w, C] float32 latents at exact timestep t (reference:
        utils.py:31-36)."""
        if self._open_native():
            return self._native.gather_indices(self._indices_for([t]))[0]
        if self._ensure_loaded():
            return self._stack[int(self._indices_for([t])[0])].astype(np.float32)
        return self._load_pt(int(t))

    def load_at_T(self) -> tuple[int, np.ndarray]:
        """Noisiest-step latents (reference: utils.py:39-45)."""
        ts = self.timesteps
        t = int(ts.max())
        return t, self.load_at_t(t)

    def gather(self, timesteps: Sequence[int]) -> np.ndarray:
        """[len(ts), F, h, w, C] — the composite pipeline's device-resident
        per-step slice."""
        if self._open_native():
            return self._native.gather_indices(self._indices_for(timesteps))
        return np.stack([self.load_at_t(int(t)) for t in timesteps])

    # -- reference .pt interop ---------------------------------------------

    def _load_pt(self, t: int) -> np.ndarray:
        p = os.path.join(self.path, f"ddim_latents_{t}.pt")
        if not os.path.exists(p):
            raise FileNotFoundError(f"missing latents at t={t}: {p}")
        import torch

        x = torch.load(p, map_location="cpu", weights_only=True).to(torch.float32).numpy()
        # [1, C, F, h, w] -> [F, h, w, C]
        return np.transpose(x[0], (1, 2, 3, 0))
