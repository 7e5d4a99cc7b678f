from .images import generate_images, images_pandas, IMAGES_SCHEMA  # noqa: F401
from .geometries import generate_geometries, generate_knn_queries  # noqa: F401
