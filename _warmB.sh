#!/bin/bash
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
for args in "--gate" "--measure-train 1" "--gate-full" "--measure 2 planes-prod"; do
  echo "[warmB $(date +%H:%M:%S)] START $args"
  timeout 2400 python bench.py $args > /tmp/warmB_$(echo $args | tr ' -' '__').out 2>&1
  echo "[warmB $(date +%H:%M:%S)] DONE rc=$? $args"
done
echo "[warmB $(date +%H:%M:%S)] ALL-DONE"
