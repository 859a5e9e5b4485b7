from .readers import (  # noqa: F401
    load_seed_file,
    load_seeds,
    read_pages,
    write_posts_csv,
)
