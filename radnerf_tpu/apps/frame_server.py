"""Interactive rendering app: orbit camera + headless frame loop.

Reference: nerf/gui.py (NeRFGUI + OrbitCamera). The reference app is a
DearPyGui desktop window whose render loop (gui.py:553-565) alternates
training bursts, ASR steps, and a free-viewpoint render. The GUI toolkit is
not a kernel concern (SURVEY.md §7 S6): here the same loop runs headless —
the InteractiveApp exposes the identical control surface (orbit/scale/pan
camera, play/pause audio-driven sequence, live training toggle, audio index
/ eye-area / individual-code / max-steps sliders as plain attributes) and
delivers frames to a callback, to disk, or over a minimal MJPEG HTTP server
for a browser viewer.

Timing matches the reference: in --asr live mode two ASR steps run per video
frame (audio features at 50 fps vs 25 fps video, gui.py:560-563).
"""

from __future__ import annotations

import math
import threading
import time
from typing import Callable, Optional

import numpy as np


class OrbitCamera:
    """Orbit camera in the NGP pose convention (gui.py:12-70)."""

    def __init__(self, W: int, H: int, r: float = 2.0, fovy: float = 60.0):
        self.W = W
        self.H = H
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        from scipy.spatial.transform import Rotation

        self._Rot = Rotation
        self.rot = Rotation.from_matrix([[0, -1, 0], [0, 0, -1], [1, 0, 0]])
        self.up = np.array([1, 0, 0], np.float32)

    @property
    def pose(self) -> np.ndarray:
        res = np.eye(4, dtype=np.float32)
        res[2, 3] -= self.radius
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = self.rot.as_matrix()
        res = rot @ res
        res[:3, 3] -= self.center
        return res

    def update_pose(self, pose: np.ndarray):
        self.radius = float(np.linalg.norm(pose[:3, 3]))
        T = np.eye(4)
        T[2, 3] = -self.radius
        self.rot = self._Rot.from_matrix((pose @ np.linalg.inv(T))[:3, :3])

    def update_intrinsics(self, intrinsics):
        _, fl_y, cx, cy = intrinsics
        self.W = int(cx * 2)
        self.H = int(cy * 2)
        self.fovy = math.degrees(2 * math.atan2(self.H, 2 * fl_y))

    @property
    def intrinsics(self) -> np.ndarray:
        focal = self.H / (2 * math.tan(math.radians(self.fovy) / 2))
        return np.array([focal, focal, self.W // 2, self.H // 2])

    def orbit(self, dx: float, dy: float):
        side = self.rot.as_matrix()[:3, 0]
        rx = self._Rot.from_rotvec(self.up * math.radians(-0.01 * dx))
        ry = self._Rot.from_rotvec(side * math.radians(-0.01 * dy))
        self.rot = rx * ry * self.rot

    def scale(self, delta: float):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx: float, dy: float, dz: float = 0.0):
        self.center += 1e-4 * self.rot.as_matrix()[:3, :3] @ np.array([dx, dy, dz])


class InteractiveApp:
    """Headless interactive loop (NeRFGUI equivalent, gui.py:73-565)."""

    def __init__(self, opt, trainer, dataset, frame_callback: Optional[Callable] = None,
                 asr=None):
        self.opt = opt
        self.trainer = trainer
        self.dataset = dataset
        self.frame_callback = frame_callback
        self.asr = asr

        self.W = dataset.W
        self.H = dataset.H
        self.cam = OrbitCamera(opt.W, opt.H, r=opt.radius, fovy=opt.fovy)
        self.cam.update_intrinsics(dataset.intrinsics)
        self.cam.update_pose(np.asarray(dataset.poses[0]))

        bg = dataset.bg_img
        if bg.shape[0] != self.H or bg.shape[1] != self.W:
            import cv2

            bg = cv2.resize(bg, (self.W, self.H))
        self.bg_color = bg.reshape(-1, 3)

        self.audio_features = dataset.auds
        self.audio_idx = 0
        self.eye_area = (
            float(np.mean(dataset.eye_area)) if getattr(dataset, "eye_area", None)
            is not None and opt.exp_eye else None
        )
        self.ind_index = 0
        self.training = False
        self.playing = False
        self.train_steps = 16
        self._play_ptr = 0
        self.mode = "image"  # or 'depth'
        self._stop = threading.Event()
        self.fps = 0.0
        # progressive supersampling when the view is static (gui.py:172-225):
        # re-render with a perturb seed and average up to opt.max_spp frames
        self.downscale = 1.0
        self.max_spp = getattr(opt, "max_spp", 1)
        self.spp = 1
        self.need_update = True
        self.render_buffer = None
        self._last_view_sig = None
        # bumped by setters that mutate view state in place (set_bg_color);
        # id() alone misses in-place mutation of a kept buffer (ADVICE r3)
        self._view_version = 0

    # -- camera controls (invalidate the accumulation buffer) ---------------
    def orbit(self, dx: float, dy: float):
        self.cam.orbit(dx, dy)
        self.need_update = True

    def scale(self, delta: float):
        self.cam.scale(delta)
        self.need_update = True

    def pan(self, dx: float, dy: float, dz: float = 0.0):
        self.cam.pan(dx, dy, dz)
        self.need_update = True

    def set_bg_color(self, bg: np.ndarray):
        """Replace (or re-use, mutated in place) the background buffer.

        Use this instead of writing into self.bg_color directly: in-place
        mutation keeps id() stable, so only the version bump invalidates a
        saturated spp accumulation buffer.
        """
        self.bg_color = np.asarray(bg, np.float32).reshape(-1, 3)
        self._view_version += 1

    # -- one tick of the reference render loop (gui.py:553-565) ------------
    def step(self) -> np.ndarray:
        t0 = time.time()
        if self.training:
            self.trainer.train_gui(self.dataset, step=self.train_steps)

        if self.asr is not None and self.playing:
            # audio runs at 50 fps, video at 25 fps -> 2 ASR steps per frame
            for _ in range(2):
                self.asr.run_step()

        frame = self.render_frame()
        self.fps = 1.0 / max(time.time() - t0, 1e-9)
        if self.frame_callback is not None:
            self.frame_callback(frame)
        return frame

    def render_frame(self) -> np.ndarray:
        from ..data.rays import get_audio_features

        if self.playing:
            if self.asr is not None:
                auds = self.asr.get_next_feat()
            else:
                auds = get_audio_features(
                    self.audio_features, self.opt.att, self._play_ptr
                )
                self._play_ptr = (self._play_ptr + 1) % len(self.audio_features)
        else:
            auds = (
                get_audio_features(self.audio_features, self.opt.att, self.audio_idx)
                if self.audio_features is not None else None
            )

        # playing/training always produce a fresh frame; a static view keeps
        # accumulating perturbed renders up to max_spp (gui.py:160-218)
        if self.training or self.playing:
            self.need_update = True
        # every non-camera view control must invalidate the accumulation
        # buffer too (the reference sets need_update=True in each GUI
        # setter, gui.py:226-320; here the controls are plain attributes,
        # so detect changes by signature): otherwise switching mode mid-
        # accumulation averages depth frames INTO the rgb buffer, and a
        # saturated buffer ignores audio_idx/eye/ind changes forever.
        view_sig = (self.mode, self.audio_idx, self.eye_area,
                    self.ind_index, self.downscale, id(self.bg_color),
                    self._view_version)
        if view_sig != self._last_view_sig:
            if self._last_view_sig is not None:
                self.need_update = True
            self._last_view_sig = view_sig
        if not (self.need_update or self.spp < self.max_spp):
            return np.clip(np.asarray(self.render_buffer), 0.0, 1.0)

        out = self.trainer.test_gui(
            self.cam.pose, self.cam.intrinsics, self.W, self.H,
            auds=auds, eye=self.eye_area if self.eye_area is not None else 0.25,
            index=self.ind_index, bg_color=self.bg_color,
            spp=1 if self.need_update else self.spp,
            downscale=self.downscale,
        )
        if self.mode == "depth":
            # raw depth is world-unit (~3-4 at the working distance): a bare
            # clip(0,1) saturates white, and saturated frames would then be
            # averaged into the spp buffer (ADVICE r3). Normalize per frame,
            # same treatment as the Trainer's saved depth PNGs.
            from ..train.trainer import Trainer

            img = Trainer._normalize_depth(out["depth"])[..., None].repeat(3, -1)
        else:
            img = out["image"]
        img = np.asarray(img, np.float32)
        if self.need_update:
            self.render_buffer = img
            self.spp = 1
            self.need_update = False
        else:
            self.render_buffer = (
                self.render_buffer * self.spp + img) / (self.spp + 1)
            self.spp += 1
        return np.clip(np.asarray(self.render_buffer), 0.0, 1.0)

    # -- drivers ------------------------------------------------------------
    def run(self, max_frames: Optional[int] = None, save_dir: Optional[str] = None):
        """Run the frame loop at 25 fps; writes PNGs when save_dir is set."""
        import imageio

        n = 0
        self.playing = self.audio_features is not None or self.asr is not None
        while not self._stop.is_set():
            frame = self.step()
            if save_dir is not None:
                imageio.imwrite(
                    f"{save_dir}/frame_{n:05d}.png",
                    (frame * 255).astype(np.uint8),
                )
            n += 1
            if max_frames is not None and n >= max_frames:
                break

    def stop(self):
        self._stop.set()

    def serve(self, host: str = "127.0.0.1", port: int = 8965):
        """Minimal MJPEG-over-HTTP frame server for a browser viewer."""
        import http.server
        import io

        app = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path != "/stream":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(b'<img src="/stream">')
                    return
                self.send_response(200)
                self.send_header(
                    "Content-Type", "multipart/x-mixed-replace; boundary=frame"
                )
                self.end_headers()
                from PIL import Image

                while not app._stop.is_set():
                    frame = app.step()
                    buf = io.BytesIO()
                    Image.fromarray((frame * 255).astype(np.uint8)).save(buf, "JPEG")
                    data = buf.getvalue()
                    self.wfile.write(b"--frame\r\nContent-Type: image/jpeg\r\n")
                    self.wfile.write(f"Content-Length: {len(data)}\r\n\r\n".encode())
                    self.wfile.write(data + b"\r\n")

            def log_message(self, *a):
                pass

        server = http.server.ThreadingHTTPServer((host, port), Handler)
        print(f"[frame-server] http://{host}:{port}/")
        try:
            server.serve_forever()
        finally:
            server.server_close()
