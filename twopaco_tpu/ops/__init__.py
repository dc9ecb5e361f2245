from twopaco_tpu.ops import pack, bloom
