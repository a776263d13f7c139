from .metrics import si_snr, snr, lsd, stoi, si_sdr, pesq_host

__all__ = ["si_snr", "snr", "lsd", "stoi", "si_sdr", "pesq_host"]
