"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.H).

Blobs are opaque ``BinaryType`` columns + typed metadata.  Everything that
can stay JVM-side does: size, content hash, magic-byte format sniffing are
built-in expressions.  Decode / feature-extract crosses into Python via
Arrow-batched ``mapInPandas`` — the schema, batch shape, and partitioning
are real; only the codec call itself is stubbed (image/audio libraries are
not in this container):

- ``decode_image_meta``: tries PIL; without it, ``fake=True`` switches to a
  DETERMINISTIC FAKE (dimensions derived from the content hash) so the
  pipeline stays testable, and ``fake=False`` raises ``NotImplementedError``
  — the stub is explicit, never silent.
- ``sample_frame_offsets``: pure-plumbing frame sampler (uniform offsets
  from declared duration — no codec needed).

At 100 TB: blobs ride in their own parquet column (column pruning keeps
metadata-only queries from touching bytes); decode runs per-partition with
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so a batch of
decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic-byte prefixes → format tag (hex, uppercase)
_MAGIC = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi/webp container
    "664C6143": "flac",
    "494433": "mp3",
    "000000": "mp4_like",
}


def blob_size(c: Column | str) -> Column:
    return F.octet_length(c).cast("bigint")


def blob_sha256(c: Column | str) -> Column:
    return F.sha2(F.col(c) if isinstance(c, str) else c, 256)


def sniff_format(c: Column | str) -> Column:
    """Magic-byte format tag from the first 4 bytes — JVM-side
    (hex + prefix match), no decoder involved."""
    head = F.upper(F.hex(F.substring(F.col(c) if isinstance(c, str) else c, 1, 4)))
    expr = F.lit("unknown")
    for magic, tag in reversed(list(_MAGIC.items())):
        expr = F.when(head.startswith(magic), F.lit(tag)).otherwise(expr)
    return expr


def with_blob_metadata(df: DataFrame, blob_col: str) -> DataFrame:
    """Attach (size, sha256, format) typed metadata — metadata queries then
    prune the byte column entirely at the parquet scan."""
    return df.withColumns(
        {
            "blob_size": blob_size(blob_col),
            "blob_sha256": blob_sha256(blob_col),
            "blob_format": sniff_format(blob_col),
        }
    )


DECODE_SCHEMA = (
    "width int, height int, channels int, decode_ok boolean, decoder string"
)


def decode_image_meta(df: DataFrame, blob_col: str, id_col: str, fake: bool = True) -> DataFrame:
    """Arrow-batched image decode returning (id, width, height, channels,
    decode_ok, decoder).

    Real plumbing: ``mapInPandas`` over (id, blob) with an explicit output
    schema — swap the inner function for a PIL/libvips call in a container
    that has one.  ``fake=True`` → deterministic dimensions from the
    content hash (clearly labeled ``decoder='fake'``); ``fake=False``
    without PIL → ``NotImplementedError``.
    """

    def decode_batches(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False

        if not have_pil and not fake:
            raise NotImplementedError(
                "image decode requires PIL/pillow (not in this container); "
                "pass fake=True for the deterministic stub"
            )

        for pdf in batches:
            out = []
            # itertuples, not iterrows: no per-row Series construction
            # (input is projected to exactly (id, blob), positions fixed)
            for rid, blob in pdf[[id_col, blob_col]].itertuples(
                index=False, name=None
            ):
                blob = blob or b""
                if have_pil and not fake:
                    import io

                    from PIL import Image

                    try:
                        img = Image.open(io.BytesIO(blob))
                        out.append(
                            (rid, img.width, img.height,
                             len(img.getbands()), True, "pil")
                        )
                        continue
                    except Exception:  # noqa: BLE001
                        out.append((rid, None, None, None, False, "pil"))
                        continue
                # DETERMINISTIC FAKE: dims from content hash
                h = hashlib.sha256(blob).digest()
                out.append(
                    (
                        rid,
                        64 + h[0] % 192,
                        64 + h[1] % 192,
                        1 + h[2] % 4,
                        True,
                        "fake",
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[id_col, "width", "height", "channels", "decode_ok", "decoder"],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {DECODE_SCHEMA}"
    return df.select(id_col, blob_col).mapInPandas(decode_batches, schema)


def sample_frame_offsets(
    df: DataFrame, duration_col: str, n_frames: int = 8
) -> DataFrame:
    """Uniform frame-sample timestamps (integer milliseconds) from a
    declared duration (seconds) — the video-pipeline plumbing step before a
    (stubbed) frame decoder.  Pure JVM: sequence + transform.  Integer
    ``floor`` instead of decimal rounding: engines disagree on half-way
    rounding of doubles, floor of the identical double is unambiguous."""
    d = F.col(duration_col).cast("double")
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.floor(i.cast("double") * d * 1000.0 / F.lit(float(n_frames))).cast(
            "bigint"
        ),
    )
    return df.withColumn("frame_offsets_ms", offsets)
