#!/bin/bash
while true; do
  PYTHONPATH=/root/repo:/root/.axon_site timeout 90 python -c "
import os
if os.environ.get('JAX_PLATFORMS')=='axon': os.environ['JAX_PLATFORMS']='axon,cpu'
import jax, numpy as np, jax.numpy as jnp
d=jax.devices()
x=jnp.ones((128,128)); y=(x@x).block_until_ready()
print('UP')" >/tmp/tunnel_status 2>&1
  if grep -q UP /tmp/tunnel_status; then
    date > /tmp/tunnel_up; echo "TUNNEL RECOVERED"; exit 0
  fi
  sleep 180
done
