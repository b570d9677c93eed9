from kanodes_tpu.ops import basis as basis
