from mre_tpu.models import kge
