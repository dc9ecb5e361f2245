from twopaco_tpu.ops import pack, hashing, bloom
