from deepsee_tpu.ops.pallas.modnorm import modulated_instance_norm
