from . import dcf, fourier, solvers
