//! Toolchain-built wasm guest (rustc nightly, wasm32-unknown-unknown).
//!
//! The container ships no wasm32 libcore, so this is #![no_core] with
//! the minimal lang items spelled out libcore-style: for primitive
//! operands rustc lowers binops straight to MIR BinOp — the traits
//! exist only so typeck resolves, and the primitive impl bodies
//! compile to the built-in op, not a recursive call.
#![no_core]
#![feature(no_core, lang_items)]
#![allow(internal_features)]
#![crate_type = "cdylib"]

#[lang = "pointee_sized"]
pub trait PointeeSized {}
#[lang = "meta_sized"]
pub trait MetaSized: PointeeSized {}
#[lang = "sized"]
pub trait Sized: MetaSized {}
#[lang = "copy"]
pub trait Copy {}
#[lang = "legacy_receiver"]
pub trait LegacyReceiver {}
impl<T: PointeeSized> LegacyReceiver for &T {}
impl Copy for i64 {}
impl Copy for u64 {}
impl Copy for u32 {}

#[lang = "mul"]
pub trait Mul<Rhs = Self> {
    type Output;
    fn mul(self, rhs: Rhs) -> Self::Output;
}
impl Mul for u64 {
    type Output = u64;
    fn mul(self, rhs: u64) -> u64 { self * rhs }
}

#[lang = "bitxor"]
pub trait BitXor<Rhs = Self> {
    type Output;
    fn bitxor(self, rhs: Rhs) -> Self::Output;
}
impl BitXor for u64 {
    type Output = u64;
    fn bitxor(self, rhs: u64) -> u64 { self ^ rhs }
}

#[lang = "bitand"]
pub trait BitAnd<Rhs = Self> {
    type Output;
    fn bitand(self, rhs: Rhs) -> Self::Output;
}
impl BitAnd for u64 {
    type Output = u64;
    fn bitand(self, rhs: u64) -> u64 { self & rhs }
}

#[lang = "shr"]
pub trait Shr<Rhs = Self> {
    type Output;
    fn shr(self, rhs: Rhs) -> Self::Output;
}
impl Shr<u32> for u64 {
    type Output = u64;
    fn shr(self, rhs: u32) -> u64 { self >> rhs }
}

#[no_mangle]
pub extern "C" fn splitmix64(x: i64) -> i64 {
    let mut z = x as u64;
    z = z ^ (z >> 30u32);
    z = z * 0xBF58476D1CE4E5B9u64;
    z = z ^ (z >> 27u32);
    z = z * 0x94D049BB133111EBu64;
    z = z ^ (z >> 31u32);
    z as i64
}

#[no_mangle]
pub extern "C" fn mix_bucket8(x: i64) -> i64 {
    let h = splitmix64(x) as u64;
    (h & 7u64) as i64
}

#[lang = "add"]
pub trait Add<Rhs = Self> {
    type Output;
    fn add(self, rhs: Rhs) -> Self::Output;
}
impl Add for u64 {
    type Output = u64;
    fn add(self, rhs: u64) -> u64 { self + rhs }
}
impl Add for i64 {
    type Output = i64;
    fn add(self, rhs: i64) -> i64 { self + rhs }
}

#[lang = "sub"]
pub trait Sub<Rhs = Self> {
    type Output;
    fn sub(self, rhs: Rhs) -> Self::Output;
}
impl Sub for i64 {
    type Output = i64;
    fn sub(self, rhs: i64) -> i64 { self - rhs }
}

#[lang = "eq"]
pub trait PartialEq<Rhs = Self> {
    fn eq(&self, rhs: &Rhs) -> bool;
}
impl PartialEq for u64 {
    fn eq(&self, rhs: &u64) -> bool { *self == *rhs }
}
impl PartialEq for i64 {
    fn eq(&self, rhs: &i64) -> bool { *self == *rhs }
}

#[lang = "partial_ord"]
pub trait PartialOrd<Rhs = Self>: PartialEq<Rhs> {
    fn lt(&self, rhs: &Rhs) -> bool;
    fn gt(&self, rhs: &Rhs) -> bool;
}
impl PartialOrd for u64 {
    fn lt(&self, rhs: &u64) -> bool { *self < *rhs }
    fn gt(&self, rhs: &u64) -> bool { *self > *rhs }
}
impl PartialOrd for i64 {
    fn lt(&self, rhs: &i64) -> bool { *self < *rhs }
    fn gt(&self, rhs: &i64) -> bool { *self > *rhs }
}

/// Iterative Fibonacci mod 2^64 — LLVM emits real loop/branch
/// structure (block/loop/br_if), unlike the straight-line mixers.
#[no_mangle]
pub extern "C" fn fib_wrap(n: i64) -> i64 {
    let mut k = n;
    if k < 0i64 { k = 0i64; }
    if k > 93i64 { k = 93i64; }
    let mut a = 0u64;
    let mut b = 1u64;
    let mut i = 0i64;
    while i < k {
        let t = a + b;
        a = b;
        b = t;
        i = i + 1i64;
    }
    a as i64
}

/// Population count via shift-and-mask loop (no popcnt intrinsic in
/// no_core — this is the branchy form real compilers emit for it).
#[no_mangle]
pub extern "C" fn popcount64(x: i64) -> i64 {
    let mut v = x as u64;
    let mut n = 0u64;
    while v > 0u64 {
        n = n + (v & 1u64);
        v = v >> 1u32;
    }
    n as i64
}
