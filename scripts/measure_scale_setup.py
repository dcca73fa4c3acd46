"""Fresh TVR-scale setup timing (VERDICT #5 done-criterion; results in BENCH_NOTES)."""
import time
t_start = time.time()
import numpy as np
from tvretrieval_tpu.data.synthetic import make_synthetic_world
from tvretrieval_tpu.data.datasets import ExampleBuilder
from tvretrieval_tpu.data.device_corpus import build_device_data

t0 = time.time()
world = make_synthetic_world(n_videos=21818, n_queries=109000, vid_dim=3072,
                             text_dim=768, query_dim=768, max_clips=100, seed=2018)
print(f"world gen: {time.time()-t0:.1f}s", flush=True)
builder = ExampleBuilder(query_source=world.query_source,
                         video_source=world.video_source,
                         sub_source=world.sub_source, ctx_mode="video_sub_tef",
                         max_desc_l=30, max_ctx_l=100,
                         clip_length=world.clip_length)
n_train = int(len(world.annotations) * 0.9)
t0 = time.time()
dd = build_device_data(builder, world.corpus, world.annotations[:n_train],
                       world.annotations[n_train:], dtype_name="float8_e4m3fn")
print(f"build_device_data (ctx table f8 + 2 query tables): {time.time()-t0:.1f}s", flush=True)
print(f"TOTAL fresh TVR-scale setup: {(time.time()-t_start)/60:.1f} min", flush=True)
