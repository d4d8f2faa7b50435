import os, time
os.environ["MAPPER_TPU_TRACE"] = "1"
import numpy as np
import bench as B
from mapper_tpu import Api, AlignmentParameters
from mapper_tpu.align.query import Query
from mapper_tpu.batch.engine import BatchAligner
ref_text, reads = B.simulate()
index = Api.new_database({"chr1": ref_text})
engine = BatchAligner(index, AlignmentParameters.defaults())
queries = [Query(r) for r in reads]
print("--- warmup ---", flush=True)
engine.process_batch(queries[:1024])
print("--- run1 ---", flush=True)
t0=time.time(); engine.process_batch(queries); print(f"total {time.time()-t0:.2f}s", flush=True)
print("--- run2 ---", flush=True)
t0=time.time(); engine.process_batch(queries); print(f"total {time.time()-t0:.2f}s", flush=True)
