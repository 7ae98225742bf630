"""Multimodal column stages: schema, stub decode seams, actor-pool
plumbing, 1->N frame sampling."""

import numpy as np
import pytest

from ebook_ocr_ray.stages.multimodal import (
    AudioFeatures,
    FrameSampler,
    ImageFeatures,
    decode_audio,
    decode_image,
    decode_video_frames,
    synth_audio,
    synth_image,
    synth_media_batch,
    synth_video,
)


class TestDecoders:
    def test_image_shape_and_determinism(self):
        a = decode_image(synth_image(7, 40, 30))
        b = decode_image(synth_image(7, 40, 30))
        assert a.shape == (30, 40, 3) and a.dtype == np.uint8
        assert (a == b).all()
        assert not (a == decode_image(synth_image(8, 40, 30))).all()

    def test_audio_shape(self):
        wave, rate = decode_audio(synth_audio(3, 4000, 16000))
        assert wave.shape == (4000,) and wave.dtype == np.float32 and rate == 16000
        assert np.abs(wave).max() <= 1.0

    def test_video_sampling_counts(self):
        frames = decode_video_frames(synth_video(1, 30, 32, 24), sample_every=5)
        assert len(frames) == 6 and frames[0].shape == (24, 32, 3)

    def test_real_codec_seam_raises(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG\r\n\x1a\n real png bytes")
        with pytest.raises(NotImplementedError):
            decode_audio(b"RIFF....WAVE")


class TestStagesLocal:
    def _batch(self, ids):
        import pyarrow as pa

        return synth_media_batch(pa.table({"doc_id": pa.array(ids, pa.int64())}))

    def test_image_features_batch(self):
        out = ImageFeatures()(self._batch([0, 3, 6, 1, 2]))   # ids %3==0 -> image
        assert out.num_rows == 3
        assert len(out["thumb"][0].as_py()) == 16 * 16 * 3

    def test_audio_features_batch(self):
        out = AudioFeatures()(self._batch([1, 4, 0]))          # %3==1 -> audio
        assert out.num_rows == 2
        assert all(0 <= v <= 1 for v in out["rms"].to_pylist())

    def test_frame_sampler_one_to_many(self):
        out = FrameSampler(every=5)(self._batch([2]))          # %3==2 -> video
        # media_id=2 -> 12 frames, sampled every 5 -> indices 0, 5, 10
        assert out["frame_idx"].to_pylist() == [0, 5, 10]


class TestPipeline:
    def test_media_pipeline_end_to_end(self, ray_session):
        from ebook_ocr_ray.stages.multimodal import (
            audio_features,
            image_features,
            media_dataset,
            video_frames,
        )

        sf = "/root/testdata/sf0.001"
        media = media_dataset(sf).to_pandas()
        assert len(media) == 500
        assert set(media.kind) == {"image", "audio", "video"}

        img = image_features(sf).to_pandas()
        aud = audio_features(sf).to_pandas()
        vid = video_frames(sf).to_pandas()
        assert len(img) == (media.kind == "image").sum()
        assert len(aud) == (media.kind == "audio").sum()
        assert vid.groupby("media_id").size().min() >= 2
        # determinism under the actor pool
        img2 = image_features(sf).to_pandas()
        assert img.sort_values("media_id").pix_mean.tolist() == \
            img2.sort_values("media_id").pix_mean.tolist()
