"""External VLM client stage: figure/image captioning via a remote
vision-language model (reference A11 — the external VLM engine clients,
src/rover/engines/ in rengotaku/ebook-ocr; declared out of v0 scope in
round 1, implemented here as the analog the brief's multimodal pattern
prescribes).

The container has no network, so the CLIENT is the stub seam — exactly
like the codec seam in stages/multimodal.py: ``RealVLMClient.caption``
raises NotImplementedError with the integration contract in its
docstring, while ``StubVLMClient`` produces deterministic captions from
the decoded image (real array math, closed-form oracle). Everything
Ray-side is real and tested:

- actor pool via ``map_batches(VLMCaptioner, concurrency=N)`` — the
  client (connection pool / auth / model handle in a real deployment)
  is constructed ONCE per actor in ``__init__``;
- request batching: images are sent in chunks of ``max_request`` per
  client call (remote VLM endpoints price and rate-limit per request);
- bounded retries with deterministic backoff around transient errors,
  exercised by a failure-injecting client in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ebook_ocr_ray.stages.multimodal import decode_image, media_dataset, _pool_size


class TransientVLMError(RuntimeError):
    """A retryable client failure (timeout, 429, 5xx)."""


class RealVLMClient:
    """Seam for a real deployment: POST a batch of encoded images to the
    VLM endpoint and return one caption per image. Plugging in a real
    backend means implementing ONLY this method (batch in, captions out);
    the captioner stage's batching/retry/actor lifecycle is unchanged."""

    def caption(self, images: list[np.ndarray]) -> list[str]:
        raise NotImplementedError(
            "no network in this environment; deployments implement "
            "caption() against their VLM endpoint"
        )


class StubVLMClient:
    """Deterministic stand-in: captions derived from real per-image array
    stats over the fake-decoded pixels, so the output is closed-form
    (oracle: 'figure WxH: brightness floor(pix_mean)') and downstream
    consumers exercise real string/array paths."""

    def caption(self, images: list[np.ndarray]) -> list[str]:
        out = []
        for img in images:
            h, w = img.shape[:2]
            out.append(f"figure {w}x{h}: brightness {int(np.floor(img.mean()))}")
        return out


class FlakyVLMClient(StubVLMClient):
    """Test double: fails the first ``fail_first`` caption() calls with a
    TransientVLMError, then behaves like the stub — drives the retry
    path deterministically."""

    def __init__(self, fail_first: int = 2):
        self.fail_first = fail_first
        self.calls = 0

    def caption(self, images: list[np.ndarray]) -> list[str]:
        self.calls += 1
        if self.calls <= self.fail_first:
            raise TransientVLMError(f"injected failure {self.calls}")
        return super().caption(images)


class VLMCaptioner:
    """Actor: decode image payloads, caption them through the client in
    rate-limit-friendly request chunks, retrying transient failures.

    ``client_factory`` (not a client instance) is passed so each actor
    builds its own connection state — client objects rarely survive
    serialization into a worker."""

    def __init__(self, client_factory=StubVLMClient, max_request: int = 16,
                 max_retries: int = 3, backoff_s: float = 0.05):
        self.client = client_factory()
        self.max_request = max_request
        self.max_retries = max(1, max_retries)   # always attempt at least once
        self.backoff_s = backoff_s

    def _caption_chunk(self, images: list[np.ndarray]) -> list[str]:
        import time

        last: Exception | None = None
        for attempt in range(self.max_retries):
            if attempt:                          # deterministic exponential
                time.sleep(self.backoff_s * (2 ** (attempt - 1)))   # backoff:
                #                                  hammering a rate-limited
                #                                  endpoint amplifies the 429s
            try:
                return self.client.caption(images)
            except TransientVLMError as ex:     # bounded retry, then raise:
                last = ex                       # silent data loss is worse
        raise last                              # than a loud failed block

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = [k == "image" for k in batch["kind"].to_pylist()]
        sub = batch.filter(pa.array(mask, pa.bool_()))
        ids = sub["media_id"].to_pylist()
        images = [decode_image(p) for p in sub["payload"].to_pylist()]
        captions: list[str] = []
        for i in range(0, len(images), self.max_request):
            captions.extend(self._caption_chunk(images[i:i + self.max_request]))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "caption": pa.array(captions, pa.string()),
            }
        )


def vlm_captions(sf_dir: str, client_factory=StubVLMClient):
    """(media_id, caption) for every image row — actor pool, small batches
    (payload-heavy rows), kind pruned before synthesis."""
    return media_dataset(sf_dir, kind="image").map_batches(
        VLMCaptioner,
        fn_constructor_kwargs={"client_factory": client_factory},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=_pool_size(),
        num_cpus=1,
    )
