"""Self-verifying dependency seams (round-8, VERDICT r7 item 4).

The real-tokenizer seam (text.encoded_ids_udf) and the media decoder
seam (multimodal.extract_features(decoder=...)) are parity-pinned
against injected fakes elsewhere; `tiktoken` and `PIL` are not
installable in the build sandbox, so those pins can never meet the real
libraries here. These tests close the loop the day the dependency
exists: importorskip-gated, they run the REAL library through the seam
and assert the Arrow-batched Spark path returns exactly what a
driver-local call returns (tokenizer) / exactly what the stdlib oracle
codec returns on lossless inputs (PIL). In this sandbox they report as
SKIPPED (verified: both imports are ModuleNotFoundError), not absent.
"""

import pytest

from pyspark.sql import functions as F


class TestTiktokenSeam:
    def test_tiktoken_encoded_ids_parity(self, spark):
        tiktoken = pytest.importorskip("tiktoken")
        from uc_historic_data_importer_spark.operators import text

        enc = tiktoken.get_encoding("cl100k_base")

        def encode(s):
            # lazy import inside the closure: cloudpickled by value
            # into the Arrow workers (the docstring's "importable or
            # self-contained" contract)
            import tiktoken as tk

            return tk.get_encoding("cl100k_base").encode(s)

        rows = [
            (1, "hello world, this is a test"),
            (2, None),
            (3, ""),
            (4, "unicode: café — 世界 \U0001f600"),
            (5, "  leading / trailing whitespace   "),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["ids"]
            for r in df.select(
                "doc_id", text.encoded_ids_udf(encode)("text").alias("ids")
            ).collect()
        }
        for doc_id, t in rows:
            if t is None:
                assert got[doc_id] is None  # NULL text -> NULL ids
            else:
                # the Spark-side Arrow batch path == a driver-local call
                assert got[doc_id] == [int(i) for i in enc.encode(t)]

        # token_count_col under the real tokenizer
        counts = {
            r["doc_id"]: r["n"]
            for r in df.filter(F.col("text").isNotNull())
            .select(
                "doc_id",
                text.token_count_col(F.col("text"), encode=encode).alias("n"),
            )
            .collect()
        }
        for doc_id, t in rows:
            if t is not None:
                assert counts[doc_id] == len(enc.encode(t))


class TestPilDecoderSeam:
    def test_pil_decoder_matches_stdlib_oracle_on_png(self, spark):
        pytest.importorskip("PIL.Image")
        from uc_historic_data_importer_spark.functions import imagecodec
        from uc_historic_data_importer_spark.operators import multimodal

        def pil_decoder(payload):
            # the PIL adapter the extract_features docstring promises is
            # "trivially adapted": decode pixels with PIL, feature with
            # the SAME luminance histogram, translate PIL's errors
            # (UnidentifiedImageError is an OSError) to the seam's
            # ValueError contract
            import io

            from PIL import Image

            from uc_historic_data_importer_spark.functions.imagecodec import (
                luminance_histogram,
            )

            try:
                img = Image.open(io.BytesIO(payload))
                img.load()
            except Exception as exc:  # noqa: BLE001 — seam contract
                raise ValueError(f"undecodable payload: {exc}") from exc
            channels = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}.get(img.mode)
            if channels is None:
                img = img.convert("RGB")
                channels = 3
            w, h = img.size
            return w, h, luminance_histogram(channels, img.tobytes())

        # lossless PNG fixtures from the repo's own encoder: PIL and the
        # stdlib codec must reconstruct IDENTICAL pixels, so the full
        # feature rows must match byte for byte
        gray = bytes((x * 17 + y * 31) % 256 for y in range(4) for x in range(5))
        rgb = bytes(
            v
            for y in range(3)
            for x in range(3)
            for v in ((x * 80) % 256, (y * 90) % 256, (x * y * 40) % 256)
        )
        rows = [
            (1, "image", imagecodec.encode_png(5, 4, 1, gray, filter_type=2)),
            (2, "image", imagecodec.encode_png(3, 3, 3, rgb, filter_type=1)),
            (3, "image", b"definitely not an image payload"),
        ]
        media = spark.createDataFrame(
            rows, "media_id long, kind string, payload binary"
        )

        def rows_of(df):
            return sorted(
                (
                    r["media_id"], r["n_bytes"], r["content_sha"],
                    r["width"], r["height"],
                    tuple(r["feature"]) if r["feature"] is not None else None,
                )
                for r in df.collect()
            )

        via_pil = rows_of(multimodal.extract_features(media, decoder=pil_decoder))
        via_stdlib = rows_of(multimodal.extract_features(media))
        # decodable rows: byte-identical feature rows across decoders
        assert [r for r in via_pil if r[0] != 3] == [
            r for r in via_stdlib if r[0] != 3
        ]
        # the garbage row: PIL can't open it, so the seam's ValueError
        # contract must map it to the (-1, -1, NULL) sentinel (the
        # stdlib oracle instead routes unknown payloads to its
        # deterministic stub — a documented behavioral difference, which
        # is why this row is excluded from the equality above)
        garbage = [r for r in via_pil if r[0] == 3][0]
        assert garbage[3] == -1 and garbage[4] == -1 and garbage[5] is None
