import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ["PST_TRACE"] = "1"
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax_comp_cache_tpu"
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from proof_systems_tpu.circuits.builders import bench_circuit, bench_witness
from proof_systems_tpu.circuits.constraints import ConstraintSystem
from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.poly_commitment.srs import SRS
from proof_systems_tpu.prover import create_proof
from proof_systems_tpu.prover_index import ProverIndex
from proof_systems_tpu.utils import TestRng
from proof_systems_tpu.verifier import verify

k = int(os.environ.get("K", "8"))
n = 1 << k
srs = SRS.create(Vesta, n)
t0 = time.time()
cs = ConstraintSystem.create(Fp, bench_circuit(Fp, n - 10), public=0, max_poly_size=n)
index = ProverIndex(cs, Vesta, srs)
vk = index.verifier_index()
print("index %.1fs" % (time.time()-t0), flush=True)
t0 = time.time()
proof = create_proof(index, bench_witness(n - 10), TestRng(5))
print("prove(+compile) %.1fs" % (time.time()-t0), flush=True)
t0 = time.time()
proof = create_proof(index, bench_witness(n - 10), TestRng(6))
print("prove(steady) %.2fs" % (time.time()-t0), flush=True)
t0 = time.time()
ok = verify(vk, proof, [], TestRng(7))
print("verify:", ok, "%.2fs" % (time.time()-t0), flush=True)
t0 = time.time()
ok = verify(vk, proof, [], TestRng(8))
print("verify(steady):", ok, "%.2fs" % (time.time()-t0), flush=True)
