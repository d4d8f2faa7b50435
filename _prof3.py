import time, numpy as np
import bench as B
from mapper_tpu import Api, AlignmentParameters
from mapper_tpu.align.query import Query
from mapper_tpu.batch.engine import BatchAligner

ref_text, reads = B.simulate()
index = Api.new_database({"chr1": ref_text})
params = AlignmentParameters.defaults()
engine = BatchAligner(index, params)
queries = [Query(r) for r in reads]
engine.process_batch(queries[:1024])  # warm
t0=time.time(); engine.process_batch(queries); print(f"full: {time.time()-t0:.2f}s for {len(queries)}", flush=True)
import cProfile, pstats, io as _io
pr = cProfile.Profile(); pr.enable()
engine.process_batch(queries)
pr.disable()
s=_io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(16); print(s.getvalue(), flush=True)
