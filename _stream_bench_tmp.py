import time
import numpy as np
import jax.numpy as jnp
from neuralcodecs_tpu.models.dia import Dia, DiaConfig
from neuralcodecs_tpu.models.dac import DAC, DACConfig

dia = Dia(DiaConfig(), compute_dtype=jnp.bfloat16).quantize_int8()
dia.set_dac_model(DAC(DACConfig.dac_44khz() if hasattr(DACConfig, "dac_44khz") else DACConfig()))
TEXT = "[S1]This is a streaming latency benchmark sentence for the decoder."
MT, SEG = 256, 32

def one_shot():
    t0 = time.perf_counter()
    a = dia.generate([TEXT], max_tokens=MT, seed=1)[0]
    np.asarray(a)
    return time.perf_counter() - t0, len(a)

def streamed(seed=1):
    t0 = time.perf_counter()
    first = None
    total = 0
    for sr, chunk in dia.generate_stream(TEXT, segment_tokens=SEG, max_tokens=MT, seed=seed):
        if first is None and len(chunk):
            first = time.perf_counter() - t0
        total += len(chunk)
    return first, time.perf_counter() - t0, total

print("warmup one-shot:", one_shot())
print("warmup stream:", streamed(seed=0))
for i in (1, 2):
    full, n = one_shot()
    fa, tot, ns = streamed()
    print(f"run{i}: one-shot {full*1e3:.0f} ms ({n} samples) | stream first-audio "
          f"{fa*1e3:.0f} ms, total {tot*1e3:.0f} ms ({ns} samples)")
