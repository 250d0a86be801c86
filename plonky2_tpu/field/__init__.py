from plonky2_tpu.field import goldilocks, scalar
