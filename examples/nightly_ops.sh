#!/usr/bin/env bash
# Nightly operations loop — the cron composition the reference ran as
# scripts/examples/cron_save_DBB_stagein_to_DBB.sh (drain stage-in) +
# cron_monitor_DBB_stagein.sh (reconciliation report), extended with the
# two resting-data health checks this engine adds (VERDICT r5 item 8):
# a rotating archive integrity scrub (cli scrub, C54) and a data-quality
# profile diffed against last night's baseline (cli profile, C46).
#
# Cron shape: run every night; the exit code is the ALERT signal — 0
# means drained + reconciled + no integrity findings + no failed checks.
# Every step still runs when an earlier one alerts (a rotten file must
# not suppress the drift report); the worst exit code wins.
#
# Environment:
#   SF_DIR        table dir for the reconciliation monitor   (required)
#   REPORT_DIR    where the HTML report pages land           (required)
#   ARCHIVE       resting archive parquet root               (required)
#   STATE_DIR     nightly state (profile baseline JSON)      (required)
#   INGEST_CONFIG ingest key=value config — skip drain if unset
#   REGISTRY      registry parquet for scrub cross-checks (optional)
#   PROFILE_PATH  dataset to profile (default: $ARCHIVE)
#   SCRUB_SAMPLE  partial-scrub fraction per night (default 0.1)
#   SCRUB_SALT    scrub epoch (default: day of year, so ~10 nights at
#                 0.1 rotate through the whole archive)
#   GC_ROOTS      space-separated versioned-snapshot roots (gate
#                 indexes, quantizer stores) to retention-gc — skip
#                 if unset; the 24 h staging horizon assumes nightly
#                 cadence (must exceed the longest snapshot write)
#   MEDIA_DROP    tonight's media drop dir — skip the perceptual gate
#                 if unset (C58: each night is one micro-batch gated
#                 against every previously accepted file's hash)
#   MEDIA_INDEX   persisted perceptual hash index   (required w/ drop)
#   MEDIA_OUT     accepted-media parquet sink       (required w/ drop)
#   MEDIA_KIND    media kind for the drop (default pgm)
#   PYTHON        interpreter (default: python)
set -u

PY=${PYTHON:-python}
PROFILE_PATH=${PROFILE_PATH:-$ARCHIVE}
SCRUB_SAMPLE=${SCRUB_SAMPLE:-0.1}
SCRUB_SALT=${SCRUB_SALT:-$(date +%j)}
mkdir -p "$REPORT_DIR" "$STATE_DIR"
rc=0

# 1. drain the stage-in area into the archive (reference: cron_save)
if [ -n "${INGEST_CONFIG:-}" ]; then
  $PY -m dbbspark.cli ingest --config "$INGEST_CONFIG" --stream || rc=$?
fi

# 1b. gate tonight's media drop against the accepted-media hash index
#     (C58 incremental perceptual dedup — a resized re-encode of a file
#     accepted LAST month still rejects; md5 cannot see it)
if [ -n "${MEDIA_DROP:-}" ]; then
  $PY -m dbbspark.cli media-dedup --src "$MEDIA_DROP" \
    --kind "${MEDIA_KIND:-pgm}" \
    --index "$MEDIA_INDEX" --out "$MEDIA_OUT" || rc=$?
fi

# 2. reconciliation report + fuzzy rename pairing (reference: cron_monitor)
$PY -m dbbspark.cli monitor --sf-dir "$SF_DIR" --out "$REPORT_DIR" \
  --fuzzy-keys || rc=$?

# 3. rotating integrity scrub of the resting archive (nonzero on findings)
$PY -m dbbspark.cli scrub --archive "$ARCHIVE" \
  ${REGISTRY:+--registry "$REGISTRY"} \
  --sample "$SCRUB_SAMPLE" --salt "$SCRUB_SALT" || rc=$?

# 4. profile + drift vs last night's baseline; tonight's profile becomes
#    the new baseline either way
if [ -f "$STATE_DIR/profile.json" ]; then
  $PY -m dbbspark.cli profile --path "$PROFILE_PATH" \
    --baseline "$STATE_DIR/profile.json" \
    --save "$STATE_DIR/profile.json" \
    --drift-html "$REPORT_DIR/drift.html" || rc=$?
else
  $PY -m dbbspark.cli profile --path "$PROFILE_PATH" \
    --save "$STATE_DIR/profile.json" || rc=$?
fi

# 4b. composed takedown for names queued by retention/compliance (one
#     file of newline-separated names; intent-audit first, archive,
#     registry, then any gate indexes in TAKEDOWN_GATES)
if [ -n "${TAKEDOWN_QUEUE:-}" ] && [ -s "$TAKEDOWN_QUEUE" ]; then
  names=$(paste -sd, "$TAKEDOWN_QUEUE")
  gate_args=""
  for g in ${TAKEDOWN_GATES:-}; do gate_args="$gate_args --gate-index $g"; done
  $PY -m dbbspark.cli takedown --names "$names" \
    --archive "$ARCHIVE" ${REGISTRY:+--registry "$REGISTRY"} \
    --quarantine "${QUARANTINE:-$ARCHIVE/../bad}" $gate_args \
    && : > "$TAKEDOWN_QUEUE" || rc=$?
fi

# 5. retention gc for versioned-snapshot state the pipelines maintain:
#    prune old versions, reap staging copies left by killed writers
for root in ${GC_ROOTS:-}; do
  $PY -m dbbspark.cli gc --root "$root" --keep-last 2 \
    --staging-horizon 86400 || rc=$?
done

exit $rc
