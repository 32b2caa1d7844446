#!/bin/bash
# On-chip serving benchmark: boot the full HTTP stack on the TPU, drive an
# open-loop load with tools/bench_serving.py, record TTFT/TPOT/ITL/goodput
# (VERDICT r3 item 5 / r4 item 3; reference harness:
# tools/benchmark/bench_perf.py). Kills only its own server PID.
set -u
cd "$(dirname "$0")/.."
PORT=${PORT:-18311}
PRESET=${PRESET:-llama-3.2-1b}
NPROMPTS=${NPROMPTS:-64}
RATE=${RATE:-8}
OUT=${OUT:-SERVING_r05.json}
# r5: warmup capture pre-runs the DECODE AND EXTEND (T,B,P) ladders
# before the server accepts traffic (capture(decode_only=False)) — the r4
# TTFT ~10 s tail was early requests paying per-boot deserialization /
# inline compiles. On a DIRECT-ATTACHED host that is the right boot mode
# (WARMUP=1). Through the axon relay the ~300-executable ladder costs
# hours, so the default here is WARMUP=0 with TWO in-boot warm passes —
# Poisson arrivals vary the batch shapes run-to-run, and two passes cover
# the shape space well enough that the measured pass stays compile-free.
WARMUP=${WARMUP:-1}
WARM_PASSES=${WARM_PASSES:-1}
WFLAG=""
if [ "$WARMUP" = "0" ]; then WFLAG="--no-warmup-capture"; fi

# bound the captured page ladder to this workload's contexts (256+64
# tokens = bucket 32): keeps the relay boot tractable while the measured
# pass sees a DETERMINISTICALLY pre-compiled (bs, window, P) space —
# stochastic warm passes alone left ~27 s inline-compile ITL tails (r5)
export SPTPU_CAPTURE_PMAX=${SPTPU_CAPTURE_PMAX:-32}

python -m scratchpad_tpu.cli.sp serve --preset "$PRESET" --random-weights \
  --max-total-tokens 65536 --max-running-requests 64 $WFLAG \
  --watchdog-timeout 900 \
  --port "$PORT" > /tmp/serve_onchip.log 2>&1 &
SPID=$!
trap 'kill $SPID 2>/dev/null' EXIT

for i in $(seq 1 960); do
  if curl -fs "http://127.0.0.1:$PORT/health" > /dev/null 2>&1; then
    break
  fi
  sleep 5
done
curl -fs "http://127.0.0.1:$PORT/health" || { echo "server never became healthy"; exit 1; }

# warm passes: radix/tokenizer paths + any shapes outside the captured
# ladder (flush after each so the measured pass repeats the same shape
# profile — cached prefixes would otherwise turn re-sent prompts into
# NEW tiny extend buckets -> inline compiles)
for w in $(seq 1 "$WARM_PASSES"); do
  python tools/bench_serving.py --base-url "http://127.0.0.1:$PORT" \
    --model "$PRESET" --num-prompts "$NPROMPTS" --input-len 256 \
    --output-len 64 --request-rate "$RATE" > /dev/null 2>&1
  curl -fs -X POST "http://127.0.0.1:$PORT/flush_cache" > /dev/null
done

python tools/bench_serving.py --base-url "http://127.0.0.1:$PORT" \
  --model "$PRESET" --num-prompts "$NPROMPTS" --input-len 256 --output-len 64 \
  --request-rate "$RATE" --slo-ttft 5.0 --slo-itl 0.5 --output "$OUT"
