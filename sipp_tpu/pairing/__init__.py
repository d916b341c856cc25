from .ate import (  # noqa: F401
    final_exp,
    inner_product,
    miller_loop,
    pairing,
)
