"""r14: q_multimodal_decode substage probe + fused decode/thumb A/B.

The composed front of the query runs TWO mapInPandas passes
(decode_media, then thumbnails) over the same content bytes: the
payload crosses the Arrow boundary four times (in+out per pass) and the
decoded struct rides through the second pass untouched. Guide §4: one
crossing that emits only (doc_id, decoded, thumb) ships the bytes once
and nothing back but the narrow features.

In ONE warm session: substage timings (decode only / composed front /
fused front / full query both ways), interleaved best-of-N, plus a
value-identity check of fused vs composed.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
REPS = 5


def main():
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from dbbspark.operators import phash
    from dbbspark.operators.phash import thumbnails
    from dbbspark.sources import multimodal as mm
    from dbbspark.sources.multimodal import DECODE_SCHEMA, decode_media
    from dbbspark.session import get_spark
    from dbbspark.tables import load_table

    spark = get_spark("probe-mm-fused")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    def docs():
        return load_table(spark, SF_DIR, "documents").select(
            "doc_id", F.col("text").cast("binary").alias("content")
        )

    # --- fused prototype: one crossing, content never returns ----------
    mm._load_default_codecs()
    phash._load_default_thumbnailers()
    decoder = mm._DECODERS.get("image", mm._fake_decode)
    thumber = phash._THUMBNAILERS.get("image") or phash._fake_thumb

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("decoded", DECODE_SCHEMA, True),
        T.StructField("thumb", T.ArrayType(T.DoubleType()), True),
    ])

    def fused(batches):
        for pdf in batches:
            dec, th = [], []
            for raw in pdf["content"]:
                if raw is None:
                    dec.append(None)
                    th.append(None)
                    continue
                b = bytes(raw)
                try:
                    dec.append(decoder(b))
                except Exception:
                    dec.append(None)
                try:
                    th.append(thumber(b))
                except Exception:
                    th.append(None)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "decoded": dec, "thumb": th}
            )

    def front_fused():
        return docs().mapInPandas(fused, schema=out_schema)

    def front_composed():
        d = decode_media(docs())
        return thumbnails(d, kind="image", on_unregistered="fake").select(
            "doc_id", "decoded", "thumb"
        )

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # value identity (sorted collect compare)
    a = front_composed().orderBy("doc_id").collect()
    b = front_fused().orderBy("doc_id").collect()
    assert len(a) == len(b), (len(a), len(b))
    mism = sum(1 for x, y in zip(a, b) if x != y)
    print(f"identity: rows={len(a)} mismatches={mism}")
    assert mism == 0

    from dbbspark.catalog import load_all

    catalog = load_all()

    def full_composed():
        return catalog["q_multimodal_decode"].builder(spark, SF_DIR)

    res: dict[str, list[float]] = {}
    legs = {
        "decode_only": lambda: decode_media(docs()).select("doc_id", "decoded"),
        "front_composed": front_composed,
        "front_fused": front_fused,
        "full_composed": full_composed,
    }
    for i in range(REPS):
        for name, fn in legs.items():
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            res.setdefault(name, []).append(t(fn()))
    for name, xs in res.items():
        print(f"{name:16s} " + " ".join("%.3f" % x for x in xs),
              " best=%.3f" % min(xs))


if __name__ == "__main__":
    main()
