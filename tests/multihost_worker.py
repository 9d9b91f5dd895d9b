"""Worker process for tests/test_multihost.py: joins a 2-process
jax.distributed CPU cluster, checks topology, loader shard disjointness and
a cross-host collective, writes results as JSON.

Run (by the test): python tests/multihost_worker.py <proc_id> <coord> <out>
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
coordinator = sys.argv[2]
out_path = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from db_text_minimal_tpu.parallel import (initialize_multihost,  # noqa: E402
                                          local_batch_slice)
from db_text_minimal_tpu.data.datasets import DataLoader  # noqa: E402

initialize_multihost(coordinator, num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == proc_id
assert len(jax.local_devices()) == 2
assert jax.device_count() == 4   # 2 hosts x 2 virtual CPU devices


class IndexDataset:
    """12-element dataset — enough to audit loader sharding."""

    def __len__(self):
        return 12


per_host = local_batch_slice(4)    # global batch 4 -> 2 per host
assert per_host == 2
loader = DataLoader(IndexDataset(), batch_size=per_host, shuffle=True,
                    seed=123, num_hosts=jax.process_count(),
                    host_id=jax.process_index(), prefetch=0, num_workers=1)
# the epoch permutation this host will consume (the sharding under audit)
seen = [int(i) for i in loader._indices()]
assert len(loader) == len(seen) // per_host

# cross-host collective: allgather host-local values, same result everywhere
from jax.experimental import multihost_utils  # noqa: E402

local_value = np.asarray([float(proc_id + 1)], np.float32)
gathered = np.asarray(multihost_utils.process_allgather(local_value))
total = float(gathered.sum())

with open(out_path, "w") as f:
    json.dump({"proc": proc_id, "seen": sorted(seen), "total": total,
               "gathered": gathered.reshape(-1).tolist()}, f)
print("WORKER_OK", proc_id)
