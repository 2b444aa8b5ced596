from etl_gmaps_spark.operators.lww import lww_winners, batch_replay  # noqa: F401
from etl_gmaps_spark.operators.similarity import (  # noqa: F401
    assign_cells,
    brute_force_topk,
    ivf_topk,
    probe_cells,
    train_centroids,
)
