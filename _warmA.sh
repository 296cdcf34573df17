#!/bin/bash
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
for args in "--measure 2 planes" "--measure 2 planes-bf16" "--measure-warps"; do
  echo "[warmA $(date +%H:%M:%S)] START $args"
  timeout 2400 python bench.py $args > /tmp/warmA_$(echo $args | tr ' -' '__').out 2>&1
  echo "[warmA $(date +%H:%M:%S)] DONE rc=$? $args"
done
echo "[warmA $(date +%H:%M:%S)] ALL-DONE"
