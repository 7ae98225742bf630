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


class TestVLMCaptioner:
    """A11 analog: external VLM client as an actor-pool stage — stubbed
    client seam, real batching/retry plumbing."""

    def test_captions_are_closed_form(self, ray_session):
        from ebook_ocr_ray.stages.vlm import vlm_captions
        from ebook_ocr_ray.stages.multimodal import decode_image, synth_image
        import numpy as np

        out = vlm_captions("/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0
        row = out.iloc[0]
        mid = int(row.media_id)
        w, h = 32 + (mid % 8) * 16, 24 + (mid % 5) * 12
        img = decode_image(synth_image(mid, w, h))
        assert row.caption == f"figure {w}x{h}: brightness {int(np.floor(img.mean()))}"

    def test_retry_recovers_from_transient_failures(self):
        import pyarrow as pa
        from ebook_ocr_ray.stages.vlm import FlakyVLMClient, VLMCaptioner
        from ebook_ocr_ray.stages.multimodal import synth_image

        batch = pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "kind": pa.array(["image", "image"], pa.string()),
                "payload": pa.array([synth_image(1, 32, 24), synth_image(2, 48, 36)],
                                    pa.binary()),
            }
        )
        cap = VLMCaptioner(client_factory=lambda: FlakyVLMClient(fail_first=2),
                           max_retries=3)
        out = cap(batch)
        assert out["caption"].to_pylist()[0].startswith("figure 32x24")

    def test_retries_exhausted_raises(self):
        import pyarrow as pa
        import pytest
        from ebook_ocr_ray.stages.vlm import (FlakyVLMClient, TransientVLMError,
                                              VLMCaptioner)
        from ebook_ocr_ray.stages.multimodal import synth_image

        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "kind": pa.array(["image"], pa.string()),
                "payload": pa.array([synth_image(1, 32, 24)], pa.binary()),
            }
        )
        cap = VLMCaptioner(client_factory=lambda: FlakyVLMClient(fail_first=5),
                           max_retries=3)
        with pytest.raises(TransientVLMError):
            cap(batch)

    def test_request_chunking(self):
        import pyarrow as pa
        from ebook_ocr_ray.stages.vlm import StubVLMClient, VLMCaptioner
        from ebook_ocr_ray.stages.multimodal import synth_image

        class CountingClient(StubVLMClient):
            calls = 0
            sizes = []

            def caption(self, images):
                CountingClient.calls += 1
                CountingClient.sizes.append(len(images))
                return super().caption(images)

        n = 10
        batch = pa.table(
            {
                "media_id": pa.array(list(range(n)), pa.int64()),
                "kind": pa.array(["image"] * n, pa.string()),
                "payload": pa.array([synth_image(i, 32, 24) for i in range(n)],
                                    pa.binary()),
            }
        )
        cap = VLMCaptioner(client_factory=CountingClient, max_request=4)
        out = cap(batch)
        assert len(out) == n
        assert CountingClient.calls == 3            # 4 + 4 + 2
        assert CountingClient.sizes == [4, 4, 2]

    def test_real_client_is_a_documented_seam(self):
        import numpy as np
        import pytest
        from ebook_ocr_ray.stages.vlm import RealVLMClient

        with pytest.raises(NotImplementedError):
            RealVLMClient().caption([np.zeros((2, 2, 3))])


class TestPreviewTrimGrid:
    """M35 analog: the trim-grid debug artifact as geometry rows."""

    def test_ratio_ladder_replicates_reference_float_loop(self):
        from ebook_ocr_ray.stages.multimodal import trim_ratios

        assert trim_ratios() == [0.05, 0.1, 0.15000000000000002, 0.2, 0.25, 0.3]

    def test_validation_mirrors_reference(self):
        import pytest
        from ebook_ocr_ray.stages.multimodal import trim_ratios

        with pytest.raises(ValueError):
            trim_ratios(step=0.0)
        with pytest.raises(ValueError):
            trim_ratios(step=0.4, max_ratio=0.3)
        with pytest.raises(ValueError):
            trim_ratios(max_ratio=0.5)

    def test_grid_rows(self, ray_session):
        from ebook_ocr_ray.stages.multimodal import preview_trim_grid

        out = preview_trim_grid("/root/testdata/sf0.001").to_pandas()
        one = out[out.media_id == out.media_id.iloc[0]]
        assert len(one) == 4 * 6                      # directions x ratios
        top = one[(one.direction == "top") & (one.ratio == 0.05)].iloc[0]
        mid = int(top.media_id)
        h = 24 + (mid % 5) * 12
        assert top.px == int(h * 0.05)
        assert top.label == "T:0.05" and top.color == "#FF0000"
