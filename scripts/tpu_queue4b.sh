#!/usr/bin/env bash
# Chained after tpu_queue4.sh (never edit a RUNNING bash script): A/B the
# upstream jax pallas flash-attention kernel against ours on the default
# preset, gated on a small-shape numerical parity check on the real chip.
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r04.log
STATUS=/tmp/tpu_status4

for _ in $(seq 1 2000); do
  [ -f /tmp/tpu_queue_stop4 ] && { echo "=== queue4b: stop requested" >> "$LOG"; exit 0; }
  [ "$(cat "$STATUS" 2>/dev/null)" = done ] && break
  sleep 60
done
[ "$(cat "$STATUS" 2>/dev/null)" = done ] || { echo "=== queue4b: queue4 never finished" >> "$LOG"; exit 1; }

echo "=== [$(date -u +%FT%TZ)] START jaxflash_parity (tiny-shape ours vs upstream on TPU)" >> "$LOG"
timeout 1800 python - >> "$LOG" 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp, math
from mvoc_tpu.ops.attention import flash_attention
from jax.experimental.pallas.ops.tpu import flash_attention as jfa
rng = np.random.default_rng(0)
b, h, s, d = 2, 5, 1024, 64
q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) for _ in range(3))
ours = flash_attention(q, k, v)
theirs = jfa.flash_attention(q, k, v, sm_scale=1.0 / math.sqrt(d))
diff = float(jnp.max(jnp.abs(ours.astype(jnp.float32) - theirs.astype(jnp.float32))))
print(f"jaxflash parity max|diff| = {diff:.6f} (bf16 out)")
assert diff < 0.02, "upstream kernel disagrees with ours beyond bf16 noise"
print("PARITY OK")
EOF
rc=$?
echo "=== [$(date -u +%FT%TZ)] END jaxflash_parity rc=$rc" >> "$LOG"
if [ $rc -ne 0 ]; then
  echo "=== queue4b: parity failed, skipping A/B" >> "$LOG"
  echo done4b > "$STATUS"; exit 1
fi

echo "=== [$(date -u +%FT%TZ)] START ab_flash_impl_jax: MVOC_FLASH_IMPL=jax bench.py" >> "$LOG"
MVOC_FLASH_IMPL=jax timeout 7200 python bench.py >> "$LOG" 2>&1
echo "=== [$(date -u +%FT%TZ)] END ab_flash_impl_jax rc=$?" >> "$LOG"
echo "=== [$(date -u +%FT%TZ)] queue4b COMPLETE" >> "$LOG"
echo done4b > "$STATUS"
