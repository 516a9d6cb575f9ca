"""Command-line entry points, mirroring the reference's CLIs:

    python -m e2e_parking_carla_tpu.cli.train      (pl_train.py)
    python -m e2e_parking_carla_tpu.cli.datagen    (carla_data_gen.py)
    python -m e2e_parking_carla_tpu.cli.evaluate   (carla_parking_eva.py)
    python -m e2e_parking_carla_tpu.cli.metric     (tool/metric.py)
"""
