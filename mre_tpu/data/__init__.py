from mre_tpu.data.kg import TripleTable, DeviceKG
