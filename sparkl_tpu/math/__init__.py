from sparkl_tpu.math.kernel import (
    quadratic_weights_1d,
    quadratic_eval,
    quadratic_eval_derivative,
    inv_d,
)
from sparkl_tpu.math.svd import svd2x2, svd3x3, svd
from sparkl_tpu.math.linalg import (
    det,
    inverse,
    trace,
    transpose,
    deviatoric_part,
    spherical_part,
    strain_rate,
    spin_tensor,
    identity_like,
    eye,
    inv_exact,
    sym_eigvals_2x2,
    sym_eigvals_3x3,
)
from sparkl_tpu.math.lame import (
    lame_lambda_mu,
    shear_modulus,
    bulk_modulus,
    shear_modulus_from_lame,
    bulk_modulus_from_lame,
)
from sparkl_tpu.math.morton import morton2_encode, morton2_decode, morton3_encode, morton3_decode
