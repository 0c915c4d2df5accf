"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store payloads as ``binary``
columns (or pointers to object storage) next to typed metadata, and run
decode / feature-extraction as Arrow-batched ``mapInPandas`` over the
binary column — Python touches each batch once, Spark controls partitioning
and pushdown around it.

The container has no image/audio codecs, so ``decode_image`` is STUBBED
(raises NotImplementedError); ``extract_binary_features`` is the same
plumbing with a real, deterministic feature set (byte length, first byte,
ascii ratio) so the mapInPandas path — schema, batching, partition
behavior — is fully exercised and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


BINARY_FEATURE_SCHEMA = "doc_id long, byte_len long, first_byte long, ascii_ratio double"

#: Per-slice cap on the concatenated payload buffer inside the feature
#: kernel. Arrow batches are bounded by ROW count
#: (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k), so a
#: media corpus of megabyte payloads would otherwise materialize a
#: multi-GB join buffer per batch; slicing on cumulative BYTES bounds
#: kernel memory at max(KERNEL_SLICE_BYTES, largest single payload)
#: regardless of the Arrow batching conf.
KERNEL_SLICE_BYTES = 64 << 20


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a ``payload`` binary column (utf-8 bytes of the text).

    Stand-in for a real media payload; at scale this column arrives from
    the source parquet already binary-typed.
    """
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _make_feature_kernel(
    id_col: str, carry_cols: tuple[str, ...], slice_bytes: int
):
    """Build the feature kernel as a self-contained closure.

    A closure is what cloudpickle ships BY VALUE to Spark's worker
    processes — a module-level kernel function would instead be pickled
    by reference and force every worker to import polario_spark (broken
    for drivers that put the repo on sys.path manually, and the reason a
    monkeypatched module global could never reach the workers). The
    factory shape keeps the kernel unit-testable in-process
    (tests/test_binary_adversaries.py drives the slicing path directly)
    while parameters travel as captured cell values."""

    def _features(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        for full in batches:
            # corrupt-row policy: a NULL payload is an unreadable blob —
            # no features exist for it; excluded here, mirrored by
            # `text IS NOT NULL` in the registry oracle
            full = full[full["payload"].notna()]
            if not len(full):
                continue
            all_lens = np.fromiter(
                (len(b) for b in full["payload"]), np.int64, len(full)
            )
            # Arrow batches are row-count-bounded; re-slice on cumulative
            # BYTES so the concat buffer below stays ≤ slice_bytes even when
            # every payload is megabytes (each slice keeps at least one row,
            # so a single over-cap payload still processes)
            cuts = [0]
            acc = 0
            for i, n in enumerate(all_lens):
                if acc + n > slice_bytes and i > cuts[-1]:
                    cuts.append(i)
                    acc = 0
                acc += int(n)
            cuts.append(len(full))
            for lo, hi in zip(cuts, cuts[1:]):
                pdf = full.iloc[lo:hi]
                payloads = pdf["payload"]
                lens = all_lens[lo:hi]
                # one flat uint8 view of the slice; per-row stats fall out
                # of cumulative sums over row-boundary offsets — no
                # per-byte (or even per-row) Python
                buf = np.frombuffer(b"".join(payloads), np.uint8)
                ends = np.cumsum(lens)
                starts = ends - lens
                ascii_cum = np.concatenate(
                    ([0], np.cumsum(buf < 128, dtype=np.int64))
                )
                ascii_counts = ascii_cum[ends] - ascii_cum[starts]
                nonempty = lens > 0
                out = pd.DataFrame(
                    {
                        # nullable Int64: ids arrive as float64+NaN when
                        # any row's id is NULL; a raw float column under
                        # the declared long schema trips Arrow's unsafe
                        # float->int cast on the whole batch
                        "doc_id": pd.array(pdf[id_col], dtype="Int64"),
                        "byte_len": lens,
                        "first_byte": (
                            # gather as int64 BEFORE np.where: under
                            # numpy-2 NEP-50 promotion, mixing a uint8
                            # array with the Python literal -1 raises
                            # OverflowError (-1 does not fit uint8); on
                            # numpy 1.x it silently upcast
                            np.where(
                                nonempty,
                                buf[np.minimum(starts, len(buf) - 1)].astype(
                                    np.int64
                                ),
                                -1,
                            )
                            if len(buf)
                            else np.full(len(lens), -1, np.int64)
                        ),
                        "ascii_ratio": np.where(
                            nonempty,
                            np.round(ascii_counts / np.maximum(lens, 1), 4),
                            0.0,
                        ),
                    }
                )
                for c in carry_cols:
                    out[c] = pdf[c].to_numpy()
                yield out

    return _features


def extract_binary_features(
    df: DataFrame,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
    slice_bytes: int = KERNEL_SLICE_BYTES,
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Real mapInPandas plumbing: batches arrive as pandas DataFrames with the
    payload as bytes objects; output schema is declared up front so Spark
    plans around the Python stage. Deterministic features stand in for a
    decoder.

    ``carry_cols`` pass through the Python stage untouched (types copied
    from the input schema). At scale this is how downstream consumers get
    metadata next to the features WITHOUT a features-back-to-source
    self-join — carrying a column through the Arrow batch costs a copy;
    the join it replaces costs two full shuffles of the corpus.

    ``slice_bytes`` caps the kernel's per-slice concat buffer (captured by
    value into the closure, so the cap genuinely reaches Spark's worker
    processes — a module global would be re-imported there at its default).
    """
    carry_ddl = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    return df.select(id_col, "payload", *carry_cols).mapInPandas(
        _make_feature_kernel(id_col, carry_cols, slice_bytes),
        schema=BINARY_FEATURE_SCHEMA + carry_ddl,
    )


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: decode an image payload into (height, width, channels).

    The execution container ships no image codecs; on a real cluster,
    replace the body of ``_decode`` with PIL/libvips calls — the Spark-side
    plumbing (mapInPandas over binary, declared schema) is identical to
    extract_binary_features above.
    """
    raise NotImplementedError(
        "image decoding requires codec libraries not present in this "
        "container; see extract_binary_features for the exercised plumbing"
    )


FRAME_CHUNK = 64
FRAME_STRIDE = 4  # keep every 4th chunk

FRAME_SAMPLE_SCHEMA = (
    "doc_id long, chunk_idx long, chunk_len long, checksum long"
)


def frame_sample(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing over a binary column: split each payload
    into fixed ``FRAME_CHUNK``-byte chunks, keep every ``FRAME_STRIDE``-th
    chunk, emit per-chunk metadata + a deterministic checksum.

    The video/audio pattern at scale: one Arrow batch in, many frame rows
    out (1:N mapInPandas), with the decoder swapped for a real codec on a
    cluster. Row counts stay bounded by stride; partitioning is inherited
    from the payload table, so frames of one document stay co-located for
    any downstream per-doc aggregation.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                # corrupt-row policy: no payload -> nothing to sample; no
                # id -> frames cannot attribute to a document (and the id
                # arrives as NaN, unrepresentable in the int64 output).
                # Both excluded, mirrored in the registry oracle's WHERE.
                if payload is None or pd.isna(doc_id):
                    continue
                n = len(payload)
                if n == 0:
                    continue
                # chunk checksums via one cumulative sum over the payload
                # view — the only Python loop left is per-document
                arr = np.frombuffer(payload, np.uint8)
                n_chunks = (n + FRAME_CHUNK - 1) // FRAME_CHUNK
                kept = np.arange(0, n_chunks, FRAME_STRIDE)
                starts = kept * FRAME_CHUNK
                ends = np.minimum(starts + FRAME_CHUNK, n)
                cum = np.concatenate(([0], np.cumsum(arr, dtype=np.int64)))
                ids.append(np.full(len(kept), doc_id, np.int64))
                idxs.append(kept)
                lens.append(ends - starts)
                sums.append((cum[ends] - cum[starts]) % 65536)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "chunk_idx": np.concatenate(idxs),
                    "chunk_len": np.concatenate(lens),
                    "checksum": np.concatenate(sums),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _sample, schema=FRAME_SAMPLE_SCHEMA
    )
