from . import fusion_etl, valid_collisions  # noqa: F401
