"""Tests for the streaming ASR pipeline and the interactive app layer."""

import numpy as np
import pytest

from radnerf_tpu.apps.asr import StreamingASR, unfold_features
from radnerf_tpu.apps.frame_server import OrbitCamera
from radnerf_tpu.config import Options


class _Opt(Options):
    pass


def _fake_logits_fn(audio_dim=44):
    """Deterministic CTC stand-in: one logit frame per 20ms chunk (approx
    wav2vec's 49 Hz rate), value = chunk mean broadcast."""

    def fn(frame: np.ndarray) -> np.ndarray:
        n = len(frame) // 320
        vals = frame[: n * 320].reshape(n, 320).mean(-1)
        return np.tile(vals[:, None], (1, audio_dim)).astype(np.float32)

    return fn


@pytest.fixture
def wav_file(tmp_path):
    from scipy.io import wavfile

    sr = 16000
    t = np.arange(sr * 3) / sr  # 3 seconds
    wave = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "test.wav")
    wavfile.write(path, sr, (wave * 32767).astype(np.int16))
    return path


def test_streaming_asr_file_mode(wav_file):
    opt = Options(asr_wav=wav_file, m=10, l=2, r=2)
    asr = StreamingASR(opt, logits_fn=_fake_logits_fn())
    # warm up fills the feature queue
    for _ in range(asr.warm_up_steps):
        asr.run_step()
    feat = asr.get_next_feat()
    assert feat.shape == (8, 44, 16)
    # continued stepping keeps producing windows, advancing 2 frames each
    for _ in range(2):
        asr.run_step()
    feat2 = asr.get_next_feat()
    assert feat2.shape == (8, 44, 16)
    # windows slide: 7 of 8 attention frames are shared
    np.testing.assert_allclose(feat[1:], feat2[:-1])


def test_streaming_asr_runs_to_termination(wav_file, tmp_path):
    opt = Options(asr_wav=wav_file, m=10, l=2, r=2, asr_save_feats=True)
    asr = StreamingASR(opt, logits_fn=_fake_logits_fn())
    asr.run()
    assert asr.terminated
    out = wav_file.replace(".wav", "_eo.npy")
    import os

    assert os.path.exists(out)
    feats = np.load(out)
    assert feats.ndim == 3 and feats.shape[1] == 16 and feats.shape[2] == 44


def test_asr_play_echoes_audio(wav_file, monkeypatch):
    """--asr_play: consumed chunks are echoed through an output stream fed
    by a player thread (reference nerf/asr.py:77-85, 201)."""
    import sys
    import types

    written = []

    class FakeStream:
        def write(self, data):
            written.append(np.frombuffer(data, np.int16))

        def stop_stream(self):
            pass

        def close(self):
            pass

    class FakePyAudio:
        def open(self, **kw):
            assert kw.get("output", False)
            return FakeStream()

    fake = types.SimpleNamespace(PyAudio=FakePyAudio, paInt16=8)
    monkeypatch.setitem(sys.modules, "pyaudio", fake)

    opt = Options(asr_wav=wav_file, m=10, l=2, r=2, asr_play=True)
    asr = StreamingASR(opt, logits_fn=_fake_logits_fn())
    asr.listen()
    assert asr.playing
    for _ in range(20):
        asr.run_step()
    # wait for the player thread to drain the queue
    import time

    for _ in range(100):
        if asr.output_queue.empty():
            break
        time.sleep(0.01)
    asr.stop()
    assert not asr.playing
    # every consumed chunk (20 steps x 320 samples) was played back as int16
    assert sum(len(w) for w in written) >= 19 * 320
    # int16 conversion: nonzero audio survives the conversion
    assert max(np.abs(w).max() for w in written) > 1000


def test_interactive_app_spp_accumulation():
    """Static view accumulates perturbed renders up to max_spp; any camera
    motion or playback resets the buffer (reference gui.py:160-225)."""
    calls = []

    class FakeTrainer:
        def test_gui(self, pose, intr, W, H, auds=None, eye=0.25, index=0,
                     bg_color=None, spp=1, downscale=1):
            calls.append(spp)
            # distinct image per spp so accumulation is observable
            return {"image": np.full((H, W, 3), float(spp), np.float32),
                    "depth": np.zeros((H, W), np.float32)}

    class FakeDS:
        W = H = 8
        intrinsics = np.array([100.0, 100.0, 4.0, 4.0])
        poses = np.eye(4, dtype=np.float32)[None]
        bg_img = np.ones((8, 8, 3), np.float32)
        auds = None
        eye_area = None

    from radnerf_tpu.apps.frame_server import InteractiveApp

    opt = Options(W=8, H=8, max_spp=3)
    app = InteractiveApp(opt, FakeTrainer(), FakeDS())
    f1 = app.render_frame()  # need_update -> fresh frame, spp=1
    assert app.spp == 1 and not app.need_update
    assert calls == [1]
    f2 = app.render_frame()  # static -> accumulate (render with seed spp=1)
    assert app.spp == 2
    f3 = app.render_frame()  # accumulate again (seed 2)
    assert app.spp == 3
    assert calls == [1, 1, 2]
    # saturated at max_spp: no further renders, buffer returned as-is
    f4 = app.render_frame()
    assert calls == [1, 1, 2]
    np.testing.assert_allclose(f4, f3)
    # value check: mean of renders 1, 1, 2 -> clipped at 1.0; use raw buffer
    np.testing.assert_allclose(app.render_buffer[0, 0, 0], (1 + 1 + 2) / 3)
    # camera motion invalidates
    app.orbit(10, 0)
    assert app.need_update
    app.render_frame()
    assert app.spp == 1 and calls == [1, 1, 2, 1]
    # non-camera view controls invalidate too (reference sets
    # need_update=True in every GUI setter, gui.py:226-320): switching mode
    # mid-accumulation must not average depth frames into the rgb buffer,
    # and a saturated buffer must not ignore control changes forever
    app.render_frame()
    app.render_frame()
    assert app.spp == 3 and calls == [1, 1, 2, 1, 1, 2]  # saturated again
    app.mode = "depth"
    f_depth = app.render_frame()
    assert app.spp == 1 and calls[-1] == 1  # fresh frame, no rgb/depth mix
    np.testing.assert_allclose(f_depth, 0.0)  # pure depth, not averaged
    app.ind_index = 1
    app.render_frame()
    assert app.spp == 1  # saturum reset by the control change


def test_unfold_features():
    feats = np.arange(20, dtype=np.float32)[:, None].repeat(3, 1)  # [20, 3]
    out = unfold_features(feats, window_size=16, stride=2)
    assert out.shape[1:] == (16, 3)
    # window 0 starts at -8 (zero pad): first 8 entries zero, then 0..7
    assert (out[0, :8] == 0).all()
    np.testing.assert_allclose(out[0, 8:, 0], np.arange(8))
    # stride 2: window 1 starts at -6
    assert (out[1, :6] == 0).all()
    np.testing.assert_allclose(out[1, 6:, 0], np.arange(10))


def test_orbit_camera():
    cam = OrbitCamera(450, 450, r=3.35, fovy=21.24)
    pose = cam.pose
    assert pose.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), 3.35, rtol=1e-5)
    cam.orbit(100, 50)
    cam.scale(1)
    cam.pan(10, -5)
    pose2 = cam.pose
    assert not np.allclose(pose, pose2)
    # update_pose round trip preserves radius
    cam.update_pose(pose2)
    np.testing.assert_allclose(cam.radius, np.linalg.norm(pose2[:3, 3]), rtol=1e-5)
    # intrinsics <-> fovy round trip
    intr = cam.intrinsics
    cam.update_intrinsics(intr)
    np.testing.assert_allclose(cam.intrinsics, intr, rtol=1e-5)


def test_deepspeech_feature_pipeline(wav_file):
    """MFCC front-end + windowing with an injected fake acoustic net."""
    from radnerf_tpu.preprocess.deepspeech import (
        audio_to_input_vector,
        extract_ds_features,
        interpolate_features,
        mfcc,
    )

    sr = 16000
    t = np.arange(sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    m = mfcc(audio, sr, numcep=26)
    assert m.shape[1] == 26 and np.isfinite(m).all()
    # ~10ms hop -> ~100 frames/sec
    assert 95 <= m.shape[0] <= 105

    iv = audio_to_input_vector(audio, sr)
    assert iv.shape[1] == 19 * 26  # (2*9+1) context windows
    assert abs(iv.mean()) < 1e-6 and abs(iv.std() - 1) < 1e-6

    feats = interpolate_features(np.arange(100, dtype=np.float64)[:, None], 50, 25, 50)
    np.testing.assert_allclose(feats[:, 0], np.arange(50) * 2.0, atol=1e-9)

    def fake_net(x):
        return np.tile(x[:, None, :29].astype(np.float32), (1, 1, 1))

    win = extract_ds_features(wav_file, net_fn=fake_net)
    assert win.ndim == 3 and win.shape[1:] == (16, 29)
    import os

    assert os.path.exists(wav_file.replace(".wav", ".npy"))
