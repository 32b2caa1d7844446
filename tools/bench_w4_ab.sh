#!/bin/bash
# A/B the W4 pallas kernel variants e2e on the real chip.
cd /root/repo
probe() {
  for i in 1 2 3 4 5; do
    timeout 120 python -c "import jax; print(jax.numpy.ones(2).sum())" >/dev/null 2>&1 && return 0
    sleep 30
  done
  return 1
}
probe || { echo "TPU unreachable" > /tmp/w4_ab.out; exit 1; }
{
  echo "=== v1 (current) ==="
  timeout 1500 env SPTPU_BENCH_QUANT=w4a16 python bench.py 2>/tmp/w4_v1.err | grep metric \
    || { echo "v1 FAILED:"; tail -5 /tmp/w4_v1.err; }
  probe
  echo "=== v2 (group-factored) ==="
  timeout 1500 env SPTPU_BENCH_QUANT=w4a16 SPTPU_W4_KERNEL=v2 python bench.py 2>/tmp/w4_v2.err | grep metric \
    || { echo "v2 FAILED:"; tail -5 /tmp/w4_v2.err; }
} > /tmp/w4_ab.out 2>&1
echo DONE >> /tmp/w4_ab.out
